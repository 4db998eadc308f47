import jax; jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import time, numpy as np, jax.numpy as jnp
from jax import lax

rng = np.random.default_rng(0)
def t(f, *a):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3): r = f(*a); jax.block_until_ready(r)
    return (time.perf_counter() - t0) / 3 * 1e3

for logn in (20, 22):
    n = 1 << logn
    k = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    v = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    pos = lax.iota(jnp.uint32, n)

    f_multi = jax.jit(lambda k, v: lax.sort([k, pos, v], num_keys=2, is_stable=False))
    f_stable2 = jax.jit(lambda k, v: lax.sort([k, v], num_keys=1, is_stable=True))
    def compose(k, v):
        k64 = (k.astype(jnp.uint64) << 32) | pos.astype(jnp.uint64)
        s = lax.sort(k64)
        p = (s & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32)
        return (s >> 32).astype(jnp.uint32), jnp.take(v, p)
    f_u64 = jax.jit(compose)
    a = t(f_multi, k, v); b = t(f_stable2, k, v); c = t(f_u64, k, v)
    print(f"n=2^{logn}  3op-numkeys2: {a:7.1f}  stable-2op: {b:7.1f}  u64-compose+take: {c:7.1f} ms")
    r1 = f_stable2(k, v); r2 = f_u64(k, v)
    assert np.array_equal(np.asarray(r1[0]), np.asarray(r2[0]))
    assert np.array_equal(np.asarray(r1[1]), np.asarray(r2[1]))
