"""Distributed sort scaling benchmark.

Measures dist_sort throughput at 1, 2, 4, ... devices on whatever mesh is
available and reports scaling efficiency (BASELINE.json target: >=80%
from 1 chip to N hosts). On a single-chip/CPU machine this validates the
methodology on virtual devices; on a pod slice it measures the real ICI
path (run one process per host with sortx.parallel.init_multihost()).

Usage: python benchmarks/bench_dist.py [--n 26] (log2 total keys)
"""

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
if "--cpu" in os.sys.argv:
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if "--cpu" in os.sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from sortx.parallel import dist_sort, make_sort_mesh, shard_1d


def _sync(r):
    # Full reduction (sharded-slice indexing is not supported eagerly).
    return float(jnp.max(r))


def measure(n_devices: int, n: int, iters: int = 3) -> float:
    mesh = make_sort_mesh(n_devices)
    keys = jax.random.bits(jax.random.PRNGKey(0), (n,), dtype=jnp.uint32)
    keys = shard_1d(keys, mesh)
    salt = jnp.uint32(0x9E3779B9)

    def step(k):
        return dist_sort(k ^ salt, mesh=mesh)

    r = step(keys)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = step(r)
    _sync(r)
    return n / ((time.perf_counter() - t0) / iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=22,
                    help="log2 of total keys")
    ap.add_argument("--cpu", action="store_true",
                    help="run on 8 virtual CPU devices")
    args = ap.parse_args()

    n = 1 << args.n
    total = len(jax.devices())
    counts, results = [], {}
    d = 1
    while d <= total:
        counts.append(d)
        d *= 2
    base = None
    for d in counts:
        rate = measure(d, n)
        results[str(d)] = round(rate, 1)
        if base is None:
            base = rate
        eff = rate / (base * d)
        print(f"devices={d}: {rate/1e6:.1f} MKeys/s "
              f"(scaling efficiency {eff*100:.0f}%)", flush=True)
    print(json.dumps({"keys": n, "throughput_by_devices": results}))


if __name__ == "__main__":
    main()
