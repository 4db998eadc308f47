import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import sortx
from sortx import Config
from sortx.parallel import dist_sort, dist_sort_kv, make_sort_mesh
import importlib; ds = importlib.import_module("sortx.parallel.dist_sort")

mesh = make_sort_mesh(8)
rng = np.random.default_rng(7)

def check(name, fn_args, kv=False, sort_bits=32):
    outs = {}
    for mode in ("sort", "rank"):
        cfg = Config(dist_local_merge=mode)
        if kv:
            k, v = fn_args
            outs[mode] = dist_sort_kv(jnp.asarray(k), jnp.asarray(v), sort_bits, mesh=mesh, config=cfg)
            outs[mode] = tuple(np.asarray(x) for x in outs[mode])
        else:
            outs[mode] = np.asarray(dist_sort(jnp.asarray(fn_args), sort_bits, mesh=mesh, config=cfg))
        assert ds.last_local_merge == mode, (name, mode, ds.last_local_merge)
    if kv:
        ok = all(np.array_equal(a, b) for a, b in zip(outs["sort"], outs["rank"]))
    else:
        ok = np.array_equal(outs["sort"], outs["rank"])
    print(f"{name}: {'OK' if ok else 'MISMATCH'}")
    assert ok, name

n = 1 << 16
k = rng.integers(0, 2**32, n, dtype=np.uint32)
v = np.arange(n, dtype=np.uint32)
check("keys uniform", k)
check("keys ragged n", k[: n - 777])
check("keys all-equal", np.full(n, 0xABCD1234, np.uint32))
check("keys all-max", np.full(n, 0xFFFFFFFF, np.uint32))
check("kv stable uniform", (k, v), kv=True)
kdup = (k & 0xFF).astype(np.uint32)
check("kv stable dup-heavy", (kdup, v), kv=True)
check("kv 16-bit partial", (k, v), kv=True, sort_bits=16)
check("kv ragged", (k[: n - 13], v[: n - 13]), kv=True)
check("kv i64 values", (k, np.arange(n, dtype=np.uint64)), kv=True)
# also vs single-device oracle
cfg = Config(dist_local_merge="rank")
sk, sv = dist_sort_kv(jnp.asarray(kdup), jnp.asarray(v), mesh=mesh, config=cfg)
ok_, ov_ = sortx.sort_kv(jnp.asarray(kdup), jnp.asarray(v))
assert np.array_equal(np.asarray(sk), np.asarray(ok_)) and np.array_equal(np.asarray(sv), np.asarray(ov_))
print("kv rank vs single-chip oracle: OK")
print("ALL GREEN")
