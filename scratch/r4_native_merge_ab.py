import jax; jax.config.update("jax_platforms", "cpu")
import time, numpy as np
from sortx.runtime import native
print("native available:", native.available())
rng = np.random.default_rng(0)
for logm, d in [(19, 2), (22, 2), (19, 8), (22, 8)]:
    m = 1 << logm
    runs = [np.sort(rng.integers(0, 2**32, m, dtype=np.uint32)) for _ in range(d)]
    keys = np.concatenate(runs)
    off = np.arange(d + 1, dtype=np.int64) * m
    idx = np.arange(d * m, dtype=np.uint32)
    t0 = time.perf_counter()
    for _ in range(3):
        ko, io = native.host_merge(keys, off, values=idx)
    t_kv = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(3):
        ko2 = native.host_merge(keys, off)
    t_k = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(3):
        exp = np.sort(keys, kind="stable")
    t_np = (time.perf_counter() - t0) / 3
    assert np.array_equal(ko, exp) and np.array_equal(ko2, exp)
    print(f"m=2^{logm} d={d}: native merge keys {t_k*1e3:7.1f} ms  +idx {t_kv*1e3:7.1f} ms  np.sort {t_np*1e3:7.1f} ms  (lax.sort ref: see r4_merge_ab)")
