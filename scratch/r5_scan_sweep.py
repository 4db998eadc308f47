"""Round-5: re-sweep scan geometry under honest (differenced, min-of-3)
timing — the r2 "1.82 ms / 591 GB/s" figure predates the timing fix.
Also: a live kernel-level profiling CSV from the real chip
(toggle_profiling parity demonstration).
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

N = 1 << 27


def _sync(r):
    if isinstance(r, tuple):
        r = r[0]
    return float(jnp.sum(r[-8:].astype(jnp.float32)))


def chain_total(step, x, iters):
    t0 = time.perf_counter()
    r = x
    for _ in range(iters):
        r = step(r)
    _sync(r)
    return time.perf_counter() - t0


def chain(step, x, iters=8, lo=2, reps=3):
    r = step(x)
    _sync(r)
    t_lo = min(chain_total(step, x, lo) for _ in range(reps))
    t_hi = min(chain_total(step, x, lo + iters) for _ in range(reps))
    return max(t_hi - t_lo, 1e-9) / iters


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    xs = (jax.random.bits(jax.random.PRNGKey(3), (N,), dtype=jnp.uint32)
          & jnp.uint32(0xFFFF)).view(jnp.int32)
    for tile in (1 << 18, 1 << 19):
        for mxu in (True, False):
            cfg = sortx.Config(scan_tile_elems=tile, scan_use_mxu=mxu)

            @jax.jit
            def step(v, cfg=cfg):
                return sortx.scan(v, config=cfg)

            try:
                dt = chain(step, xs)
                print(f"scan tile=2^{tile.bit_length()-1} mxu={mxu}: "
                      f"{dt*1e3:.2f} ms = {N/dt/1e9:.1f} Ge/s = "
                      f"{2*4*N/dt/1e9:.0f} GB/s r+w", flush=True)
            except Exception as e:
                print(f"tile={tile} mxu={mxu}: FAILED {e!r}"[:200],
                      flush=True)

    # ---- live kernel-level profiling CSV off the real chip ----------
    from sortx.runtime import toggle_profiling

    csv = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "PROFILE_EXAMPLE_v5e.csv")
    if os.path.exists(csv):
        os.remove(csv)
    toggle_profiling(True, csv, level="kernel")
    try:
        k = jax.random.bits(jax.random.PRNGKey(9), (1 << 24,),
                            dtype=jnp.uint32)
        out = sortx.sort(k)          # eager: every engine pass rows
        _sync(out)
    finally:
        toggle_profiling(False, level="op")
    rows = open(csv).read().strip().splitlines()
    print(f"profiling rows: {len(rows)} (first 3):", flush=True)
    for r in rows[:3]:
        print("  " + r, flush=True)
    print("  ...", flush=True)
    for r in rows[-2:]:
        print("  " + r, flush=True)


if __name__ == "__main__":
    main()
