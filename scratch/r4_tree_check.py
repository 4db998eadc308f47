import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, importlib
import sortx
from sortx import Config
from sortx.parallel import dist_sort, dist_sort_kv, make_sort_mesh
ds = importlib.import_module("sortx.parallel.dist_sort")

rng = np.random.default_rng(3)
cfgT = Config(engine="pallas", interpret=True, engine_min_n=0,
              engine_log_block=10, dist_local_merge="tree")
cfgS = Config(engine="pallas", interpret=True, engine_min_n=0,
              engine_log_block=10, dist_local_merge="sort")

def check(name, keys, vals=None, sort_bits=32, d=8):
    mesh = make_sort_mesh(d)
    outs = {}
    for nm, cfg in (("tree", cfgT), ("sort", cfgS)):
        if vals is None:
            outs[nm] = (np.asarray(dist_sort(jnp.asarray(keys), sort_bits, mesh=mesh, config=cfg)),)
        else:
            outs[nm] = tuple(np.asarray(x) for x in dist_sort_kv(jnp.asarray(keys), jnp.asarray(vals), sort_bits, mesh=mesh, config=cfg))
        assert ds.last_local_merge == nm, (nm, ds.last_local_merge)
        assert ds.last_local_engine == "bitonic"
    ok = all(np.array_equal(a, b) for a, b in zip(outs["tree"], outs["sort"]))
    print(f"{name}: {'OK' if ok else 'MISMATCH'}")
    assert ok, name

n = 1 << 14
k = rng.integers(0, 2**32, n, dtype=np.uint32)
v = np.arange(n, dtype=np.uint32)
check("keys uniform d8", k)
check("keys uniform d2", k, d=2)
check("kv stable dup-heavy", (k & 0x3F).astype(np.uint32), v)
check("kv 16-bit", k, v, sort_bits=16)
check("ragged", k[: n - 13])
check("presorted (skew fallback)", np.sort(k))       # diag arrivals -> cond fallback
check("all-equal", np.full(n, 0x7F7F7F7F, np.uint32))
check("all-max kv", np.full(n, 0xFFFFFFFF, np.uint32), v)
print("TREE ALL GREEN")
