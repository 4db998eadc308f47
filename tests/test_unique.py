"""unique tests (ops/unique.py) vs numpy's unique."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sortx


def _oracle(x):
    return np.unique(x, return_counts=True)


@pytest.mark.parametrize("n,hi,size", [(1024, 50, 64), (20_000, 500, 600),
                                       (4096, 2**32, 4096)])
def test_unique_basic(rng, n, hi, size):
    x = rng.randint(0, hi, size=n, dtype=np.uint64).astype(np.uint32)
    vals, counts, nu = sortx.unique(jnp.asarray(x), size)
    ev, ec = _oracle(x)
    k = min(len(ev), size)
    assert int(nu) == len(ev)
    assert np.array_equal(np.asarray(vals)[:k], ev[:k])
    assert np.array_equal(np.asarray(counts)[:k], ec[:k])
    assert np.all(np.asarray(counts)[k:] == 0)


def test_unique_fill_semantics(rng):
    x = np.array([5, 3, 3, 9, 5], np.uint32)
    vals, counts, nu = sortx.unique(jnp.asarray(x), 6)
    assert int(nu) == 3
    assert np.array_equal(np.asarray(vals), [3, 5, 9, 9, 9, 9])
    assert np.array_equal(np.asarray(counts), [2, 2, 1, 0, 0, 0])
    vals2, _, _ = sortx.unique(jnp.asarray(x), 6, fill_value=0)
    assert np.array_equal(np.asarray(vals2), [3, 5, 9, 0, 0, 0])


def test_unique_size_smaller_than_distinct(rng):
    x = rng.permutation(np.arange(1000)).astype(np.uint32)
    vals, counts, nu = sortx.unique(jnp.asarray(x), 10)
    assert int(nu) == 1000
    assert np.array_equal(np.asarray(vals), np.arange(10, dtype=np.uint32))
    assert np.all(np.asarray(counts) == 1)


def test_unique_all_equal(rng):
    x = np.full(5000, 7, np.uint32)
    vals, counts, nu = sortx.unique(jnp.asarray(x), 4)
    assert int(nu) == 1
    assert np.asarray(vals)[0] == 7
    assert np.asarray(counts)[0] == 5000
    assert np.all(np.asarray(counts)[1:] == 0)


def test_unique_assume_sorted(rng):
    x = np.sort(rng.randint(0, 100, size=3000).astype(np.int32))
    vals, counts, nu = sortx.unique(jnp.asarray(x), 128, assume_sorted=True)
    ev, ec = _oracle(x)
    assert int(nu) == len(ev)
    assert np.array_equal(np.asarray(vals)[:len(ev)], ev)
    assert np.array_equal(np.asarray(counts)[:len(ev)], ec)


def test_unique_signed_and_float(rng):
    xi = rng.randint(-50, 50, size=5000).astype(np.int32)
    vals, counts, nu = sortx.unique(jnp.asarray(xi), 128)
    ev, ec = _oracle(xi)
    assert np.array_equal(np.asarray(vals)[:len(ev)], ev)
    assert np.array_equal(np.asarray(counts)[:len(ev)], ec)

    xf = rng.choice(np.array([-2.5, -1.0, 0.0, 1.5, 3.25], np.float32),
                    size=4000).astype(np.float32)
    vals, counts, nu = sortx.unique(jnp.asarray(xf), 8)
    ev, ec = _oracle(xf)
    assert int(nu) == len(ev)
    assert np.array_equal(np.asarray(vals)[:len(ev)], ev)
    assert np.array_equal(np.asarray(counts)[:len(ev)], ec)


def test_unique_jit(rng):
    x = rng.randint(0, 64, size=8192).astype(np.uint32)
    f = jax.jit(lambda a: sortx.unique(a, 64))
    vals, counts, nu = f(jnp.asarray(x))
    ev, ec = _oracle(x)
    assert int(nu) == len(ev)
    assert np.array_equal(np.asarray(vals)[:len(ev)], ev)
    assert np.array_equal(np.asarray(counts)[:len(ev)], ec)


def test_unique_empty_and_errors():
    vals, counts, nu = sortx.unique(jnp.zeros((0,), jnp.uint32), 4)
    assert int(nu) == 0
    assert np.all(np.asarray(counts) == 0)
    with pytest.raises(ValueError):
        sortx.unique(jnp.zeros(8, jnp.uint32), 0)
    with pytest.raises(TypeError):
        sortx.unique(jnp.zeros(8, jnp.uint8), 4)
