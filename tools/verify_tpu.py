"""TPU verification drive: pallas kernels bit-exact vs numpy oracle.

Run under the watchdog: tools/tpurun.sh /tmp/verify_tpu.out tools/verify_tpu.py 3600
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
import time

import jax

# Route the cache dir through jax.config too: jax is pre-imported by
# sitecustomize, so the env var alone is read too late (round-4 fix).
jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.environ["JAX_COMPILATION_CACHE_DIR"]))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

import sortx
from sortx.ops import sort_pallas

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu", "expected the tunneled TPU"

# Host->device transfer probe: the tunnel moves incompressible data at
# ~1 MB/s on bad days — print the rate so stage sizing is explainable.
_probe = np.random.default_rng(0).integers(0, 2**32, 1 << 20,
                                           dtype=np.uint32)  # 4 MB
_t0 = time.perf_counter()
_d = jnp.asarray(_probe)
float(jnp.sum(_d[-8:].astype(jnp.float32)))
print(f"upload rate ~{4 / (time.perf_counter() - _t0):.1f} MB/s",
      flush=True)

rng = np.random.default_rng(123)


def sync(r):
    if isinstance(r, tuple):
        r = r[0]
    return float(jnp.sum(r[-8:].astype(jnp.float32)))


def check(name, ok):
    print(("PASS " if ok else "FAIL ") + name, flush=True)
    assert ok, name


# scan: 2^20 (the size the reference fails at), 2^24, ragged
for n in (1 << 20, 1 << 24, (1 << 22) + 777):
    x = rng.integers(0, 16, n).astype(np.int32)
    t0 = time.perf_counter()
    s = sortx.scan(jnp.asarray(x))
    sync(s)
    ex = np.concatenate([[0], np.cumsum(x)[:-1]]).astype(np.int32)
    check(f"scan n={n} ({time.perf_counter()-t0:.1f}s w/ compile)",
          np.array_equal(np.asarray(s), ex))

# sort: big enough to hit the Pallas bitonic engine (n >= 2^22 on TPU)
for n in (1 << 22, (1 << 22) + 13):
    k = rng.integers(0, 2**32, n, dtype=np.uint32)
    t0 = time.perf_counter()
    got = sortx.sort(jnp.asarray(k))
    sync(got)
    check(f"sort n={n} ({time.perf_counter()-t0:.1f}s w/ compile) "
          f"dispatch={sort_pallas.last_dispatch}",
          np.array_equal(np.asarray(got), np.sort(k)))

# stable KV on the engine path
n = 1 << 22
k = rng.integers(0, 64, n, dtype=np.uint32)
v = np.arange(n, dtype=np.uint32)
ks, vs = sortx.sort_kv(jnp.asarray(k), jnp.asarray(v))
sync(ks)
order = np.argsort(k, kind="stable")
check(f"sort_kv stable n={n} dispatch={sort_pallas.last_dispatch}",
      np.array_equal(np.asarray(ks), k[order])
      and np.array_equal(np.asarray(vs), v[order]))

# kv unstable (the ns=2 tie_break geometry that OOMed scoped VMEM in r3)
n = 1 << 22
k = rng.integers(0, 2**32, n, dtype=np.uint32)
v = rng.integers(0, 2**32, n, dtype=np.uint32)
ks, vs = sortx.sort_kv(jnp.asarray(k), jnp.asarray(v), stable=False)
sync(ks)
ks_np, vs_np = np.asarray(ks), np.asarray(vs)
pair = lambda a, b: np.lexsort((b, a))
check(f"sort_kv unstable n={n}",
      bool(np.all(ks_np[1:] >= ks_np[:-1]))
      and np.array_equal(np.stack([ks_np, vs_np], 1)[pair(ks_np, vs_np)],
                         np.stack([k, v], 1)[pair(k, v)]))

# hybrid engine (bitonic phase sorts) correctness on silicon
cfg_h = sortx.Config(engine="hybrid", engine_min_n=0)
n = 1 << 22
k = rng.integers(0, 2**32, n, dtype=np.uint32)
got = sortx.sort(jnp.asarray(k), config=cfg_h)
sync(got)
check(f"hybrid sort n={n} dispatch={sort_pallas.last_dispatch}",
      np.array_equal(np.asarray(got), np.sort(k)))

# out-of-core through the REAL device: 2^24 keys in 2^22 chunks (the
# development tunnel moves incompressible data at ~1 MB/s on bad days,
# so the host<->HBM staging is sized to the link; the full 2^30 = 4 GiB
# machinery proof runs tunnel-free on the CPU backend in
# tools/verify_oocore_2e30.py, committed alongside this log).
t0 = time.perf_counter()
n = 1 << 24
big = rng.integers(0, 2**32, n, dtype=np.uint32)
out = sortx.sort_large(big, chunk_elems=1 << 22)
ok = out.shape[0] == n and np.array_equal(out, np.sort(big))
check(f"sort_large 2^24 via 4 device chunks "
      f"({time.perf_counter()-t0:.0f}s)", ok)
del big, out

print("ALL TPU CHECKS PASSED")
