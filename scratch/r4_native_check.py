import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, importlib
import sortx
from sortx import Config
from sortx.parallel import dist_sort, dist_sort_kv, make_sort_mesh
ds = importlib.import_module("sortx.parallel.dist_sort")
mesh = make_sort_mesh(8)
rng = np.random.default_rng(11)
def check(name, k, v=None, sort_bits=32):
    outs = {}
    for mode in ("sort", "native"):
        cfg = Config(dist_local_merge=mode)
        if v is None:
            outs[mode] = (np.asarray(dist_sort(jnp.asarray(k), sort_bits, mesh=mesh, config=cfg)),)
        else:
            outs[mode] = tuple(np.asarray(x) for x in dist_sort_kv(jnp.asarray(k), jnp.asarray(v), sort_bits, mesh=mesh, config=cfg))
        assert ds.last_local_merge == mode, (mode, ds.last_local_merge)
    ok = all(np.array_equal(a,b) for a,b in zip(outs["sort"], outs["native"]))
    print(name, "OK" if ok else "MISMATCH"); assert ok
n = 1 << 16
k = rng.integers(0, 2**32, n, dtype=np.uint32)
v = np.arange(n, dtype=np.uint32)
check("keys", k)
check("keys all-max", np.full(n, 0xFFFFFFFF, np.uint32))
check("kv dup", (k & 0xFF).astype(np.uint32), v)
check("kv 16-bit", k, v, sort_bits=16)
check("kv f16 vals", k, rng.standard_normal(n).astype(np.float16))
check("ragged", k[:n-777])
# default auto resolves to native on CPU now
dist_sort(jnp.asarray(k), mesh=mesh)
assert ds.last_local_merge == "native", ds.last_local_merge
print("auto->native OK")
