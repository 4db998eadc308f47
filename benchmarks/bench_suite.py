"""Benchmark suite mirroring the reference's UnitTest demos + large-n runs.

Reference demo timings (README.md:76-133): Demo.Sort32 sweep 1K->1024K =
1352 ms wall, Demo.SortKeyValue = 512 ms, Demo.Scan = 251 ms (1 failure) on
an AMD GPU circa 2011. This suite reproduces the same sweeps (including the
+13 ragged KV sizes) plus the BASELINE.json large-n configs (2^27 keys,
skewed distributions).

Timing note: block_until_ready is unreliable on the tunneled TPU; a
dependent scalar fetch forces execution (see .claude/skills/verify).

Usage: python benchmarks/bench_suite.py [--quick]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax

# Route the cache dir through jax.config too: jax is pre-imported by
# sitecustomize, so the env var alone is read too late (round-4 fix).
jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.environ["JAX_COMPILATION_CACHE_DIR"]))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

import sortx


def _sync(*rs) -> float:
    return sum(float(jnp.sum(r.reshape(-1)[-8:].astype(jnp.float32)))
               for r in rs)


_OVERHEAD = None


def _fetch_overhead() -> float:
    """Host-fetch latency through the tunnel (subtracted from timings)."""
    global _OVERHEAD
    if _OVERHEAD is None:
        x = jnp.zeros((16,), jnp.float32)
        f = jax.jit(lambda v: v + 1)
        _sync(f(x))
        t0 = time.perf_counter()
        for _ in range(10):
            _sync(f(x))
        _OVERHEAD = (time.perf_counter() - t0) / 10
    return _OVERHEAD


def _time(fn, args, iters=3):
    r = fn(*args)
    _sync(*(r if isinstance(r, tuple) else (r,)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _sync(*(r if isinstance(r, tuple) else (r,)))
    return max((time.perf_counter() - t0) - _fetch_overhead(), 1e-9) / iters


def sweep_sizes():
    s, out = 1024, []
    while s < 2 * 1024 * 1024:
        out.append(s)
        s *= 2
    return out


def kv_sweep_sizes():
    out, size = [], 1024
    while size < 2 * 1024 * 1024:
        size += 13
        out.append(size)
        size *= 2
    return out


def _warm(fn, *args):
    """Compile outside the timed region: the reference's OpenCL kernels are
    size-independent and disk-cached, so its demo wall times exclude
    compilation; XLA compiles per shape, which must likewise be excluded
    for an apples-to-apples demo comparison."""
    r = fn(*args)
    _sync(*(r if isinstance(r, tuple) else (r,)))


def demo_sort32(rng):
    """Demo.Sort32 analog: sweep + verify vs golden (README.md:79-94)."""
    sizes = sweep_sizes()
    for n in sizes:
        _warm(lambda k: sortx.sort(k), jnp.zeros((n,), jnp.uint32))
    t0 = time.perf_counter()
    for n in sizes:
        keys = rng.randint(0, 2**32, size=n, dtype=np.uint32)
        out = np.asarray(sortx.sort(jnp.asarray(keys)))
        assert np.array_equal(out, sortx.reference.radix_sort(keys)), n
    return (time.perf_counter() - t0) * 1e3


def demo_sort_kv(rng):
    sizes = kv_sweep_sizes()
    for n in sizes:
        _warm(lambda k, v: sortx.sort_kv(k, v),
              jnp.zeros((n,), jnp.uint32), jnp.zeros((n,), jnp.uint32))
    t0 = time.perf_counter()
    for n in sizes:
        keys = rng.randint(0, 2**32, size=n, dtype=np.uint32)
        vals = np.arange(n, dtype=np.uint32)
        ks, vs = sortx.sort_kv(jnp.asarray(keys), jnp.asarray(vals))
        gk, gv = sortx.reference.radix_sort_kv(keys, vals)
        assert np.array_equal(np.asarray(ks), gk), n
        assert np.array_equal(np.asarray(vs), gv), n
    return (time.perf_counter() - t0) * 1e3


def demo_scan(rng):
    """Demo.Scan analog — including the n=1024K case the reference FAILS."""
    sizes = sweep_sizes() + [1 << 20]
    for n in sizes:
        _warm(lambda x: sortx.scan(x), jnp.zeros((n,), jnp.int32))
    t0 = time.perf_counter()
    for n in sizes:
        x = rng.randint(0, 16, size=n).astype(np.int32)
        out = np.asarray(sortx.scan(jnp.asarray(x)))
        assert np.array_equal(out, sortx.reference.exclusive_scan(x)), n
    return (time.perf_counter() - t0) * 1e3


def large_sort_throughput(n, dist="uniform", kv=False, iters=5):
    key = jax.random.PRNGKey(123)
    if dist == "uniform":
        keys = jax.random.bits(key, (n,), dtype=jnp.uint32)
    elif dist == "all_equal":
        keys = jnp.full((n,), 0xDEADBEEF, dtype=jnp.uint32)
    elif dist == "low_entropy":
        keys = (jax.random.bits(key, (n,), dtype=jnp.uint32)
                & jnp.uint32(0xF))
    elif dist == "sorted":
        keys = jax.lax.sort(jax.random.bits(key, (n,), dtype=jnp.uint32))
    salt = jnp.uint32(0x9E3779B9)
    if kv:
        vals = jnp.arange(n, dtype=jnp.uint32)
        fn = jax.jit(lambda k, v: sortx.sort_kv(k ^ salt, v))
        t = _time(fn, (keys, vals), iters)
    else:
        fn = jax.jit(lambda k: sortx.sort(k ^ salt))
        t = _time(fn, (keys,), iters)
    return n / t


def scan_throughput(n, iters=5):
    x = jax.random.bits(jax.random.PRNGKey(1), (n,), dtype=jnp.uint32)
    fn = jax.jit(lambda v: sortx.scan(v.view(jnp.int32)).view(jnp.uint32))
    t = _time(fn, (x,), iters)
    return n / t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    big = (1 << 27) if on_tpu else (1 << 20)
    rng = np.random.RandomState(123)
    results = {"backend": jax.default_backend()}

    results["demo_sort32_ms"] = round(demo_sort32(rng), 1)
    results["demo_sort_kv_ms"] = round(demo_sort_kv(rng), 1)
    results["demo_scan_ms"] = round(demo_scan(rng), 1)
    results["ref_demo_sort32_ms"] = 1352.0   # README.md:94
    results["ref_demo_sort_kv_ms"] = 512.0   # README.md:107
    results["ref_demo_scan_ms"] = 251.0      # README.md:123 (+1 FAIL)

    if not args.quick:
        results["sort_u32_keys_per_s"] = round(
            large_sort_throughput(big), 1)
        results["sort_kv_keys_per_s"] = round(
            large_sort_throughput(big, kv=True), 1)
        results["sort_all_equal_keys_per_s"] = round(
            large_sort_throughput(big, "all_equal"), 1)
        results["sort_low_entropy_keys_per_s"] = round(
            large_sort_throughput(big, "low_entropy"), 1)
        results["scan_elems_per_s"] = round(scan_throughput(big), 1)
        results["vs_baseline_520mkeys"] = round(
            results["sort_u32_keys_per_s"] / 520e6, 3)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
