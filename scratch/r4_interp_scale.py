import jax; jax.config.update("jax_platforms", "cpu")
import time, numpy as np, jax.numpy as jnp
import sortx
for n, lb in [(20_000, 12), (20_000, 10), (8192, 12), (8192, 10), (4096, 10), (8192, 11)]:
    cfg = sortx.Config(engine="pallas", interpret=True, engine_min_n=0, engine_log_block=lb)
    k = jnp.asarray(np.random.default_rng(0).integers(0, 2**32, n, dtype=np.uint32))
    r = sortx.sort(k, config=cfg); np.asarray(r)
    t0 = time.perf_counter()
    r = sortx.sort(k ^ jnp.uint32(1), config=cfg); np.asarray(r)
    print(f"n={n} lb={lb}: {time.perf_counter()-t0:.2f}s")
