import jax; jax.config.update("jax_platforms", "cpu")
import os, time, numpy as np, jax.numpy as jnp
import sortx
cfg = sortx.Config(engine="pallas", interpret=True, engine_min_n=0, engine_log_block=12)
k = jnp.asarray(np.random.default_rng(0).integers(0, 2**32, 20_000, dtype=np.uint32))
t0 = time.perf_counter()
r = sortx.sort(k, config=cfg); np.asarray(r)
t1 = time.perf_counter()
for _ in range(3):
    r = sortx.sort(k ^ jnp.uint32(123), config=cfg); np.asarray(r)
t2 = time.perf_counter()
print(f"first (trace+compile+run): {t1-t0:.2f}s; steady: {(t2-t1)/3:.2f}s/run")
