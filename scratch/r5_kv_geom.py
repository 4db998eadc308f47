"""Round-5 KV-throughput attack (VERDICT item 2c): multi-stream block
geometry on real silicon.

Hypothesis: stable KV (ns=3) runs kernel A at lb16 -> rows=512 -> H=4,
which is the DEGRADED layout regime (no transposed tail: _tail_bits=0,
no mid regroup: _mid_ok False) — the source of KV's ~25% cost beyond
the structural 3x stream proportionality (2230/3 = 743 theoretical vs
595 measured). Escalating kernel A to lb17 (H=8, all good layouts) via
cfg.engine_log_block=18 (the per-ns shrink then yields lb17) should
recover it — IF the ns=3 chain fits scoped VMEM.

Measures (dependent-chain timing, 2^27):
  kv-stable   : default (lb16) vs log_block=18 (lb17)
  kv-unstable : default (lb16) vs log_block=18 (lb17)
  u64         : default (lb16) vs log_block=18 (lb17)
  keys-only   : default (lb17) control re-measure
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

    for lb, label in ((None, "default"), (18, "log_block=18")):
        cfg = (sortx.default_config() if lb is None
               else sortx.Config(engine="pallas", engine_log_block=lb))

        @jax.jit
        def step_kv(k, v, cfg=cfg):
            return sortx.sort_kv(k ^ salt, v, config=cfg)

        bench(f"kv-stable  [{label}]", step_kv, (keys, vals))

        @jax.jit
        def step_kvu(k, v, cfg=cfg):
            return sortx.sort_kv(k ^ salt, v, stable=False, config=cfg)

        bench(f"kv-unstable[{label}]", step_kvu, (keys, vals))

        @jax.jit
        def step_u64(hi, lo, cfg=cfg):
            return sortx.sort_u64(hi ^ salt, lo, config=cfg)

        bench(f"u64        [{label}]", step_u64, (keys, vals))

    @jax.jit
    def step(k):
        return sortx.sort(k ^ salt)

    bench("keys-only  [default]", step, keys)


if __name__ == "__main__":
    main()
