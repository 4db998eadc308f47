"""Round-5: pow2 unstable-KV comparator A/B on silicon.

The pow2 unstable path uses a key-only comparator (nk=1, tie_break) —
cheapest per layer, but its kernel-B chain is probe-REJECTED at
lb_bd=18, capping it at 17. The (key, value) comparator (nk=2, the
ragged form — equally valid unstable semantics) probes OK at 18.
Which wins end-to-end at 2^27?
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.environ["JAX_COMPILATION_CACHE_DIR"]))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

import sortx
from sortx.ops.sort_pallas import _bitonic

N = 1 << 27
ITERS = 6


def _sync(r):
    if isinstance(r, tuple):
        r = r[0]
    return float(jnp.sum(r[-8:].astype(jnp.float32)))


def chain(step, x, iters=ITERS):
    r = step(*x)
    _sync(r)
    t0 = time.perf_counter()
    r = x
    for _ in range(iters):
        r = step(*r)
    _sync(r)
    return (time.perf_counter() - t0) / iters


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    keys = jax.random.bits(jax.random.PRNGKey(123), (N,), dtype=jnp.uint32)
    vals = jax.random.bits(jax.random.PRNGKey(7), (N,), dtype=jnp.uint32)
    salt = jnp.uint32(0x9E3779B9)
    cfg = sortx.default_config()

    @jax.jit
    def step_nk1(k, v):
        return _bitonic((k ^ salt, v), 1, N, cfg, tie_break=True)

    @jax.jit
    def step_nk2(k, v):
        return _bitonic((k ^ salt, v), 2, N, cfg)

    for name, fn in (("nk=1 tie_break (lb_bd 17)", step_nk1),
                     ("nk=2 key+value (lb_bd 18?)", step_nk2)):
        try:
            dt = chain(fn, (keys, vals))
            print(f"{name}: {dt*1e3:.1f} ms = {N/dt/1e6:.0f} MK/s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    from sortx.ops import bitonic
    print("probe cache:", bitonic._GEOM_OK, flush=True)


if __name__ == "__main__":
    main()
