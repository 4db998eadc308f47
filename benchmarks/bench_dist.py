"""Distributed sort scaling benchmark -> machine-readable artifact.

Measures dist_sort throughput at 1, 2, 4, ... devices and emits one JSON
line per point plus a final summary line:

  {"metric": "dist_sort_scaling", "devices": D, "keys_per_s": r,
   "scaling_efficiency": e, "exchange": "ragged"|"dense", ...}

Weak scaling by default (fixed keys PER DEVICE, the pod-relevant metric
for BASELINE.json's >=80% 1-chip -> N-hosts target); --strong fixes the
TOTAL size instead. Runs unmodified anywhere: on a single-chip/CPU
machine it validates the methodology on virtual devices (the dense
exchange — XLA:CPU lacks RaggedAllToAll; the "exchange" field says which
path was measured); on a pod slice one process per host
(sortx.parallel.init_multihost()) measures the real ICI ragged path.
The summary is also written to benchmarks/DIST_SCALING.json.
"""

import argparse
import importlib
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

# Route the cache dir through jax.config too: jax is pre-imported by
# sitecustomize, so the env var alone is read too late (round-4 fix).
jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.environ["JAX_COMPILATION_CACHE_DIR"]))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

if "--cpu" in os.sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from sortx.parallel import dist_sort, make_sort_mesh, shard_1d

ds_mod = importlib.import_module("sortx.parallel.dist_sort")


def _sync(r):
    # Full reduction (sharded-slice indexing is not supported eagerly).
    return float(jnp.max(r))


def measure(n_devices: int, n: int, iters: int = 3) -> float:
    """Keys/s by chain-length differencing, min-of-3 (same method as
    bench.py since round 5: the constant dispatch + dependent-fetch
    cost cancels instead of contaminating the per-iteration figure —
    on the tunneled TPU the fetch alone can be ~35-100 ms)."""
    mesh = make_sort_mesh(n_devices)
    keys = jax.random.bits(jax.random.PRNGKey(0), (n,), dtype=jnp.uint32)
    keys = shard_1d(keys, mesh)
    salt = jnp.uint32(0x9E3779B9)

    def step(k):
        return dist_sort(k ^ salt, mesh=mesh)

    r = step(keys)
    _sync(r)

    def total(k):
        t0 = time.perf_counter()
        rr = keys
        for _ in range(k):
            rr = step(rr)
        _sync(rr)
        return time.perf_counter() - t0

    t_lo = min(total(1) for _ in range(3))
    t_hi = min(total(1 + iters) for _ in range(3))
    return n / (max(t_hi - t_lo, 1e-9) / iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=22,
                    help="log2 keys per device (weak) or total (strong)")
    ap.add_argument("--strong", action="store_true",
                    help="fix the TOTAL size instead of per-device size")
    ap.add_argument("--cpu", action="store_true",
                    help="run on 8 virtual CPU devices")
    ap.add_argument("--out", default="DIST_SCALING.json",
                    help="artifact filename (under benchmarks/)")
    args = ap.parse_args()

    total_devices = len(jax.devices())
    # Virtual CPU meshes timeshare real cores: with C cores, D > C
    # devices run at most C-at-a-time, capping weak-scaling efficiency
    # at C/D even for a zero-overhead algorithm. Report that ceiling
    # alongside the raw number so the curve stays interpretable
    # (measured here: 8 virtual devices on 4 cores -> ceiling 0.5).
    ncores = os.cpu_count() or 1
    cpu_mesh = jax.default_backend() == "cpu"
    counts = []
    d = 1
    while d <= total_devices:
        counts.append(d)
        d *= 2
    points = []
    base = None
    for d in counts:
        n = (1 << args.n) if args.strong else (1 << args.n) * d
        rate = measure(d, n)
        if base is None:
            base = rate
        eff = rate / (base * d) if not args.strong else rate / base / d * 1
        ceiling = min(1.0, ncores / d) if cpu_mesh else 1.0
        point = {
            "metric": "dist_sort_scaling",
            "devices": d,
            "keys": n,
            "keys_per_s": round(rate, 1),
            "scaling_efficiency": round(eff, 3),
            "ideal_ceiling": round(ceiling, 3),
            "efficiency_vs_ceiling": round(eff / ceiling, 3),
            "exchange": ds_mod.last_exchange,
            "mode": "strong" if args.strong else "weak",
            "backend": jax.default_backend(),
        }
        points.append(point)
        print(json.dumps(point), flush=True)

    # Single-chip vs d=1-mesh overhead (round-1 verdict ask): how much
    # the mesh machinery (shard_map + rebalance) costs over a plain
    # sortx.sort of the same size on one device.
    from sortx import sort as _plain_sort

    n1 = points[0]["keys"]
    keys = jax.random.bits(jax.random.PRNGKey(0), (n1,), dtype=jnp.uint32)
    salt = jnp.uint32(0x9E3779B9)
    step = jax.jit(lambda k: _plain_sort(k ^ salt))
    r = step(keys)
    _sync(r)

    def total1(k):
        t0 = time.perf_counter()
        rr = keys
        for _ in range(k):
            rr = step(rr)
        _sync(rr)
        return time.perf_counter() - t0

    t_lo = min(total1(1) for _ in range(3))
    t_hi = min(total1(4) for _ in range(3))
    single_rate = n1 / (max(t_hi - t_lo, 1e-9) / 3)

    summary = dict(points[-1])
    summary["single_chip_keys_per_s"] = round(single_rate, 1)
    summary["d1_mesh_overhead"] = round(
        single_rate / points[0]["keys_per_s"], 3)
    summary["cpu_cores"] = ncores
    summary["target_efficiency"] = 0.8
    summary["meets_target"] = summary["scaling_efficiency"] >= 0.8
    # Largest point whose device count fits the physical cores — the
    # only point where raw efficiency is not oversubscription-noise.
    full_core = [p for p in points if p["devices"] <= ncores]
    if full_core:
        summary["efficiency_at_full_cores"] = \
            full_core[-1]["scaling_efficiency"]
        summary["devices_at_full_cores"] = full_core[-1]["devices"]
    summary["points"] = points
    out_path = os.path.join(os.path.dirname(__file__), args.out)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "points"}))


if __name__ == "__main__":
    main()
