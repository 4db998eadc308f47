"""16-bit key dtypes (u16/i16/f16/bf16) via exact monotone widening."""

import jax.numpy as jnp
import numpy as np
import pytest

import sortx


def _rand16(rng, dtype, n):
    if dtype == np.uint16:
        return rng.randint(0, 2**16, size=n).astype(dtype)
    if dtype == np.int16:
        return rng.randint(-2**15, 2**15, size=n).astype(dtype)
    # finite floats exactly representable in the half type
    x = (rng.standard_normal(n) * 8).astype(np.float32)
    if dtype == np.float16:
        return x.astype(np.float16)
    return x  # bfloat16 built by the caller from f32


@pytest.mark.parametrize("dtype", [np.uint16, np.int16, np.float16])
@pytest.mark.parametrize("n", [1024, 20_000])
def test_sort_16bit(rng, dtype, n):
    k = _rand16(rng, dtype, n)
    got = np.asarray(sortx.sort(jnp.asarray(k)))
    assert got.dtype == dtype
    assert np.array_equal(got, np.sort(k))


def test_sort_bfloat16(rng):
    k32 = np.round(rng.standard_normal(10_000) * 8, 2).astype(np.float32)
    k = jnp.asarray(k32).astype(jnp.bfloat16)
    got = sortx.sort(k)
    assert got.dtype == jnp.bfloat16
    exp = np.sort(np.asarray(k.astype(jnp.float32)))
    assert np.array_equal(np.asarray(got.astype(jnp.float32)), exp)


def test_sort_kv_16bit_stable(rng):
    n = 30_000
    k = rng.randint(0, 50, size=n).astype(np.uint16)
    v = np.arange(n, dtype=np.uint32)
    ks, vs = sortx.sort_kv(jnp.asarray(k), jnp.asarray(v))
    order = np.argsort(k, kind="stable")
    assert ks.dtype == jnp.uint16
    assert np.array_equal(np.asarray(ks), k[order])
    assert np.array_equal(np.asarray(vs), v[order])


def test_argsort_16bit(rng):
    n = 10_000
    k = rng.randint(-100, 100, size=n).astype(np.int16)
    perm = np.asarray(sortx.argsort(jnp.asarray(k)))
    assert np.array_equal(perm, np.argsort(k, kind="stable"))


def test_merge_16bit(rng):
    a = np.sort(rng.randint(0, 2**16, size=5000).astype(np.uint16))
    b = np.sort(rng.randint(0, 2**16, size=3000).astype(np.uint16))
    got = np.asarray(sortx.merge(jnp.asarray(a), jnp.asarray(b)))
    assert got.dtype == np.uint16
    assert np.array_equal(got, np.sort(np.concatenate([a, b])))


def test_kth_value_16bit(rng):
    k = rng.randint(-500, 500, size=8192).astype(np.int16)
    got = sortx.kth_value(jnp.asarray(k), 1234)
    assert got.dtype == jnp.int16
    assert int(got) == int(np.sort(k)[1234])


def test_descending_16bit(rng):
    k = rng.randint(0, 2**16, size=4096).astype(np.uint16)
    got = np.asarray(sortx.sort(jnp.asarray(k), descending=True))
    assert np.array_equal(got, np.sort(k)[::-1])


def test_dist_sort_16bit(rng):
    mesh = sortx.make_sort_mesh()
    k = rng.randint(0, 2**16, size=1 << 13).astype(np.uint16)
    got = np.asarray(sortx.dist_sort(jnp.asarray(k), mesh=mesh))
    assert got.dtype == np.uint16
    assert np.array_equal(got, np.sort(k))


def test_sort_rows_16bit(rng):
    k = rng.randint(0, 2**16, size=(16, 512)).astype(np.uint16)
    got = np.asarray(sortx.sort_rows(jnp.asarray(k)))
    assert got.dtype == np.uint16
    assert np.array_equal(got, np.sort(k, axis=1))


def test_sort_segments_16bit(rng):
    n = 4096
    k = rng.randint(-2**15, 2**15, size=n).astype(np.int16)
    off = np.array([0, 1000, 1000, 3000, n], dtype=np.int32)
    got = np.asarray(sortx.sort_segments(jnp.asarray(k), jnp.asarray(off)))
    exp = k.copy()
    for a, b in zip(off[:-1], off[1:]):
        exp[a:b] = np.sort(exp[a:b])
    assert np.array_equal(got, exp)


def test_partial_bits_still_requires_u32():
    with pytest.raises(ValueError):
        sortx.sort(jnp.zeros(8, jnp.uint16), sort_bits=8)
