"""Headline benchmark: u32 keys/s for a 2^27-key single-chip sort.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference's published ~520 MKeys/s 32-bit radix sort
throughput on an AMD HD5870/HD6970 (BASELINE.md; Harada & Howes paper §4).

Timing note: on the axon-tunneled TPU, ``block_until_ready`` does not
reliably block, so we force a dependent scalar fetch and amortize over a
chained loop (each iteration re-sorts a permuted copy so work cannot be
cached or elided).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(r) -> float:
    """Force execution: tiny dependent host fetch (tunnel-safe)."""
    return float(jnp.sum(r[-8:].astype(jnp.float32)))


def main():
    import sortx

    print("bench: starting (progress on stderr; stdout gets one JSON line)",
          file=sys.stderr, flush=True)
    on_tpu = jax.default_backend() == "tpu"
    n = 1 << 27 if on_tpu else 1 << 20
    key = jax.random.PRNGKey(123)
    keys = jax.random.bits(key, (n,), dtype=jnp.uint32)

    salt = jnp.uint32(0x9E3779B9)

    @jax.jit
    def step(k):
        # XOR with an odd constant permutes the key space bijectively, so
        # each chained iteration sorts a genuinely different array.
        return sortx.sort(k ^ salt)

    # Warmup / compile.
    print(f"bench: compiling + warmup at n=2^{n.bit_length()-1}",
          file=sys.stderr, flush=True)
    r = step(keys)
    _sync(r)
    print("bench: timing", file=sys.stderr, flush=True)

    # Fetch-overhead calibration.
    tiny = jnp.zeros((16,), jnp.uint32)
    f_tiny = jax.jit(lambda v: v + 1)
    _sync(f_tiny(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        _sync(f_tiny(tiny))
    overhead = (time.perf_counter() - t0) / 10

    iters = 10 if on_tpu else 3
    t0 = time.perf_counter()
    r = keys
    for _ in range(iters):
        r = step(r)
    _sync(r)
    dt = max(time.perf_counter() - t0 - overhead, 1e-9) / iters

    keys_per_s = n / dt
    baseline = 520e6  # MKeys/s -> keys/s (BASELINE.md row 1)
    print(json.dumps({
        "metric": "u32_radix_sort_keys_per_s_single_chip_2e27",
        "value": round(keys_per_s, 1),
        "unit": "keys/s",
        "vs_baseline": round(keys_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
