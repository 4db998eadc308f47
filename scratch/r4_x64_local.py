import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from jax import lax

def compose(k):
    n = k.shape[0]
    with jax.enable_x64(True):
        pos = lax.iota(jnp.uint64, n)
        k64 = (k.astype(jnp.uint64) << np.uint64(32)) | pos
        s = lax.sort(k64)
        p = (s & np.uint64(0xFFFFFFFF)).astype(jnp.int32)
        sk = (s >> np.uint64(32)).astype(jnp.uint32)
    return sk, p

f = jax.jit(compose)
k = jnp.asarray(np.random.default_rng(0).integers(0, 2**32, 1 << 16, dtype=np.uint32))
sk, p = f(k)
exp = np.sort(np.asarray(k))
assert np.array_equal(np.asarray(sk), exp), "keys mismatch"
assert np.array_equal(np.asarray(k)[np.asarray(p)], exp)
print("local x64 compose under jit: OK, x64 global =", jax.config.jax_enable_x64)
