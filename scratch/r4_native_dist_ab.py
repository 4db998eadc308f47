import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import time, numpy as np, jax.numpy as jnp
from sortx import Config
from sortx.parallel import dist_sort, make_sort_mesh, shard_1d
for d in (2, 4):
    mesh = make_sort_mesh(d)
    n = (1 << 22) * d
    keys = shard_1d(jnp.asarray(np.random.default_rng(0).integers(0, 2**32, n, dtype=np.uint32)), mesh)
    salt = jnp.uint32(0x9E3779B9)
    for mode in ("sort", "native"):
        cfg = Config(dist_local_merge=mode)
        step = lambda k: dist_sort(k ^ salt, mesh=mesh, config=cfg)
        r = step(keys); float(jnp.max(r))
        t0 = time.perf_counter()
        for _ in range(3): r = step(r)
        float(jnp.max(r))
        print(f"d={d} {mode}: {(time.perf_counter()-t0)/3*1e3:8.1f} ms")
