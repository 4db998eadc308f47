import jax; jax.config.update("jax_platforms", "cpu")
import time, numpy as np, jax.numpy as jnp
from jax import lax
import importlib
ds = importlib.import_module("sortx.parallel.dist_sort")

rng = np.random.default_rng(0)
for logm, d in [(19, 2), (19, 8), (22, 2), (22, 8)]:
    m = 1 << logm
    buf = ds._recv_buf_len(m, d, max(64, d**3))
    # build d sorted runs left-packed
    sizes = rng.multinomial(buf - 64, [1/d]*d)
    runs = [np.sort(rng.integers(0, 2**32, s, dtype=np.uint32)) for s in sizes]
    arr = np.concatenate(runs + [np.full(buf - sizes.sum(), 0xFFFFFFFF, np.uint32)])
    recv_sizes = jnp.asarray(sizes.astype(np.int32))
    rt = int(sizes.sum())
    x = jnp.asarray(arr)
    f_rank = jax.jit(lambda a, rs: ds._merge_runs_rank((a,), rs, rt, jnp.uint32(0xFFFFFFFF), m, d)[0])
    f_sort = jax.jit(lambda a: lax.sort(a))
    for name, f, args in [("rank", f_rank, (x, recv_sizes)), ("sort", f_sort, (x,))]:
        r = f(*args); r.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3): r = f(*args); r.block_until_ready()
        dt = (time.perf_counter() - t0) / 3
        print(f"m=2^{logm} d={d} {name}: {dt*1e3:8.1f} ms")
    # equality
    assert np.array_equal(np.asarray(f_rank(x, recv_sizes)), np.asarray(f_sort(x)))
