"""Round-5: d_fuse sweep for u64 (ns=2, nk=2) at its probe-won
lb_bd=18 geometry — the r4 sweep that chose 8 ran at lb_bd 17."""

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


def _sync(r):
    if isinstance(r, tuple):
        r = r[0]
    return float(jnp.sum(r[-8:].astype(jnp.float32)))


def chain(step, x, iters=6, lo=2, reps=3):
    r = step(*x)
    _sync(r)

    def total(k):
        t0 = time.perf_counter()
        rr = x
        for _ in range(k):
            rr = step(*rr)
        _sync(rr)
        return time.perf_counter() - t0

    t_lo = min(total(lo) for _ in range(reps))
    t_hi = min(total(lo + iters) for _ in range(reps))
    return max(t_hi - t_lo, 1e-9) / iters


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    keys = jax.random.bits(jax.random.PRNGKey(123), (N,), dtype=jnp.uint32)
    vals = jax.random.bits(jax.random.PRNGKey(7), (N,), dtype=jnp.uint32)
    salt = jnp.uint32(0x9E3779B9)
    orig = bitonic._d_fuse
    for fuse in (8, 6, 10):
        bitonic._d_fuse = (lambda ns, f=fuse: f)
        jax.clear_caches()

        @jax.jit
        def step(hi, lo):
            return sortx.sort_u64(hi ^ salt, lo)

        try:
            dt = chain(step, (keys, vals))
            print(f"u64 d_fuse={fuse}: {dt*1e3:.1f} ms = "
                  f"{N/dt/1e6:.0f} MK/s", flush=True)
        except Exception as e:
            print(f"u64 d_fuse={fuse}: FAILED {str(e)[:200]}", flush=True)
    bitonic._d_fuse = orig


if __name__ == "__main__":
    main()
