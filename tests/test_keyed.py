"""Stream compaction + key-grouped reductions (ops/keyed.py) vs numpy."""

import jax.numpy as jnp
import numpy as np
import pytest

import sortx


# ---------------------------------------------------------------- partition

@pytest.mark.parametrize("n", [1, 37, 1024, 20_000, 65536 + 13])
def test_partition_random(rng, n):
    x = rng.randint(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    mask = rng.rand(n) < 0.3
    out, nt = sortx.partition(jnp.asarray(x), jnp.asarray(mask))
    assert int(nt) == int(mask.sum())
    expect = np.concatenate([x[mask], x[~mask]])
    assert np.array_equal(np.asarray(out), expect)


@pytest.mark.parametrize("frac", [0.0, 1.0])
def test_partition_degenerate_masks(rng, frac):
    x = rng.randint(0, 100, size=4096).astype(np.int32)
    mask = np.full(4096, bool(frac))
    out, nt = sortx.partition(jnp.asarray(x), jnp.asarray(mask))
    assert int(nt) == int(mask.sum())
    assert np.array_equal(np.asarray(out), x)


def test_partition_value_dtypes(rng):
    x = rng.randn(2048).astype(np.float32)
    mask = x > 0
    out, nt = sortx.partition(jnp.asarray(x), jnp.asarray(mask))
    expect = np.concatenate([x[mask], x[~mask]])
    assert np.array_equal(np.asarray(out), expect)


def test_partition_validation():
    x = jnp.zeros((8,), jnp.uint32)
    with pytest.raises(ValueError):
        sortx.partition(x.reshape(2, 4), jnp.zeros((2, 4), bool))
    with pytest.raises(ValueError):
        sortx.partition(x, jnp.zeros((4,), bool))
    with pytest.raises(TypeError):
        sortx.partition(x, jnp.zeros((8,), jnp.int32))


# ------------------------------------------------- reduce_by_key / RLE


def _rbk_oracle(keys, values):
    """Consecutive-run keys and value sums (mod 2^32)."""
    starts = np.flatnonzero(np.concatenate(
        [[True], keys[1:] != keys[:-1]]))
    ends = np.append(starts[1:], len(keys))
    rk = keys[starts]
    sums = np.array([values[s:e].astype(np.uint64).sum() & 0xFFFFFFFF
                     for s, e in zip(starts, ends)], np.uint32)
    return rk, sums, ends - starts


@pytest.mark.parametrize("n,hi,size", [(1024, 8, 2048), (20_000, 3, 32),
                                       (4096 + 13, 200, 512)])
def test_reduce_by_key_random(rng, n, hi, size):
    keys = rng.randint(0, hi, size=n).astype(np.uint32)
    vals = rng.randint(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    rk, rs, nr = sortx.reduce_by_key(jnp.asarray(keys), jnp.asarray(vals),
                                     size)
    ek, es, _ = _rbk_oracle(keys, vals)
    k = min(len(ek), size)
    assert int(nr) == len(ek)
    assert np.array_equal(np.asarray(rk)[:k], ek[:k])
    assert np.array_equal(np.asarray(rs)[:k], es[:k])
    assert np.all(np.asarray(rs)[k:] == 0)


def test_reduce_by_key_i32_and_fill(rng):
    keys = np.array([3, 3, 7, 7, 7, 1], np.int32)
    vals = np.array([1, 2, 10, -20, 5, 100], np.int32)
    rk, rs, nr = sortx.reduce_by_key(jnp.asarray(keys), jnp.asarray(vals), 5,
                                     fill_value=-1)
    assert int(nr) == 3
    assert np.array_equal(np.asarray(rk), [3, 7, 1, -1, -1])
    assert np.array_equal(np.asarray(rs), [3, -5, 100, 0, 0])


def test_reduce_by_key_all_equal(rng):
    keys = np.full(8192, 42, np.uint32)
    vals = np.ones(8192, np.uint32)
    rk, rs, nr = sortx.reduce_by_key(jnp.asarray(keys), jnp.asarray(vals), 4)
    assert int(nr) == 1
    assert int(np.asarray(rk)[0]) == 42 and int(np.asarray(rs)[0]) == 8192


def test_reduce_by_key_validation():
    k = jnp.zeros((8,), jnp.uint32)
    with pytest.raises(ValueError):
        sortx.reduce_by_key(k, jnp.zeros((4,), jnp.uint32), 4)
    with pytest.raises(TypeError):
        sortx.reduce_by_key(k, jnp.zeros((8,), jnp.float32), 4)
    with pytest.raises(ValueError):
        sortx.reduce_by_key(k, jnp.zeros((8,), jnp.uint32), 0)


@pytest.mark.parametrize("n,hi", [(1024, 5), (20_000, 1000)])
def test_sum_by_key_random(rng, n, hi):
    keys = rng.randint(0, hi, size=n).astype(np.uint32)
    vals = rng.randint(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    size = hi + 3
    rk, rs, nr = sortx.sum_by_key(jnp.asarray(keys), jnp.asarray(vals), size)
    ek = np.unique(keys)
    es = np.array([vals[keys == key].astype(np.uint64).sum() & 0xFFFFFFFF
                   for key in ek], np.uint32)
    assert int(nr) == len(ek)
    assert np.array_equal(np.asarray(rk)[:len(ek)], ek)
    assert np.array_equal(np.asarray(rs)[:len(ek)], es)


def test_run_length_encode(rng):
    x = np.repeat(np.array([9, 2, 7, 9, 5], np.uint32),
                  [3, 1, 4, 2, 1000])
    rv, rl, nr = sortx.run_length_encode(jnp.asarray(x), 8)
    assert int(nr) == 5
    assert np.array_equal(np.asarray(rv)[:5], [9, 2, 7, 9, 5])
    assert np.array_equal(np.asarray(rl)[:5], [3, 1, 4, 2, 1000])
    assert np.all(np.asarray(rl)[5:] == 0)


def test_run_length_encode_floats_neg_zero():
    x = np.array([-0.0, 0.0, 0.0, 1.5], np.float32)
    rv, rl, nr = sortx.run_length_encode(jnp.asarray(x), 4)
    # Bitwise equality: -0.0 and +0.0 are distinct runs (consistent with
    # the sort's total order, where -0.0 < +0.0).
    assert int(nr) == 3
    assert np.array_equal(np.asarray(rl)[:3], [1, 2, 1])


def test_empty_inputs():
    e_u32 = jnp.zeros((0,), jnp.uint32)
    out, nt = sortx.partition(e_u32, jnp.zeros((0,), bool))
    assert out.shape == (0,) and int(nt) == 0
    rk, rs, nr = sortx.reduce_by_key(e_u32, e_u32, 3)
    assert rk.shape == (3,) and int(nr) == 0 and np.all(np.asarray(rs) == 0)
    rv, rl, nr2 = sortx.run_length_encode(e_u32, 2)
    assert int(nr2) == 0


# --------------------------------------------- searchsorted / is_sorted


@pytest.mark.parametrize("side", ["left", "right"])
def test_searchsorted_ints(rng, side):
    a = np.sort(rng.randint(0, 1000, size=4096).astype(np.int32))
    q = rng.randint(-10, 1010, size=777).astype(np.int32)
    got = sortx.searchsorted(jnp.asarray(a), jnp.asarray(q), side=side)
    assert np.array_equal(np.asarray(got), np.searchsorted(a, q, side=side))


def test_searchsorted_float_nan(rng):
    # Haystack in sortx.sort order: NaNs at the positive extreme.
    a = np.asarray(sortx.sort(jnp.asarray(
        np.array([3.0, np.nan, -1.0, 2.0, np.inf], np.float32))))
    q = np.array([np.nan, 2.5, -np.inf], np.float32)
    got = np.asarray(sortx.searchsorted(jnp.asarray(a), jnp.asarray(q)))
    # Positive NaN inserts before the existing NaN (side=left) at index 4;
    # 2.5 between 2.0 and 3.0; -inf at the very front.
    assert got.tolist() == [4, 2, 0]


def test_searchsorted_validation():
    a = jnp.zeros((4,), jnp.uint32)
    with pytest.raises(ValueError):
        sortx.searchsorted(a, a, side="mid")
    with pytest.raises(TypeError):
        sortx.searchsorted(a, jnp.zeros((4,), jnp.int32))


def test_is_sorted(rng):
    x = rng.randint(0, 2**32, size=4096, dtype=np.uint64).astype(np.uint32)
    assert not bool(sortx.is_sorted(jnp.asarray(x)))
    assert bool(sortx.is_sorted(jnp.asarray(np.sort(x))))
    assert bool(sortx.is_sorted(jnp.asarray(np.sort(x)[::-1].copy()),
                                descending=True))
    f = np.array([-np.inf, -0.0, 0.0, 5.0, np.nan], np.float32)
    assert bool(sortx.is_sorted(jnp.asarray(f)))   # sortx total order
    assert bool(sortx.is_sorted(jnp.zeros((1,), jnp.uint32)))
