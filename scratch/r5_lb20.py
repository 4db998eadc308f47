"""Round-5 (VERDICT item 7): lb_bd = 20 experiment on silicon.

Raises bitonic._BD_MAX to 20 (H=64 tail/mid layouts now exist) so the
compile PROBE decides admissibility of (b, cont) chains at lb 20, then
A/B-measures keys-only and kv-unstable at 2^27 against the lb_bd=19
default from the same process. kernel B is the largest cost block
(48.8 ms of the r3 62 ms chain); lb 20 removes one whole B+D stage
group (the 3-stage continuation absorbs stages 18..20).
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
from sortx.ops import bitonic

N = 1 << 27
ITERS = 6


def _sync(r):
    if isinstance(r, tuple):
        r = r[0]
    return float(jnp.sum(r[-8:].astype(jnp.float32)))


def chain(step, x, iters=ITERS):
    r = step(x) if not isinstance(x, tuple) else step(*x)
    _sync(r)
    t0 = time.perf_counter()
    r = x
    for _ in range(iters):
        r = step(r) if not isinstance(r, tuple) else step(*r)
    _sync(r)
    return (time.perf_counter() - t0) / iters


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    keys = jax.random.bits(jax.random.PRNGKey(123), (N,), dtype=jnp.uint32)
    vals = jax.random.bits(jax.random.PRNGKey(7), (N,), dtype=jnp.uint32)
    salt = jnp.uint32(0x9E3779B9)

    def bench(name, fn, x):
        try:
            dt = chain(fn, x)
            print(f"{name}: {dt*1e3:.1f} ms = {N/dt/1e6:.0f} MK/s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    for bd_max in (19, 20):
        bitonic._BD_MAX = bd_max
        # fresh trace per setting (jit caches key on nothing we change)
        jax.clear_caches()

        @jax.jit
        def step(k):
            return sortx.sort(k ^ salt)

        bench(f"keys-only [bd_max={bd_max}]", step, keys)

        @jax.jit
        def step_kvu(k, v):
            return sortx.sort_kv(k ^ salt, v, stable=False)

        bench(f"kv-unstbl [bd_max={bd_max}]", step_kvu, (keys, vals))
    print("probe cache:", {k: v for k, v in bitonic._GEOM_OK.items()},
          flush=True)


if __name__ == "__main__":
    main()
