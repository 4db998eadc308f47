"""Segmented scan tests (ops/segscan.py) vs a per-segment numpy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sortx


def _oracle(x, offsets, inclusive=False):
    out = np.zeros_like(x)
    totals = np.zeros(len(offsets) - 1, dtype=x.dtype)
    for i in range(len(offsets) - 1):
        seg = x[offsets[i]:offsets[i + 1]]
        c = np.cumsum(seg.astype(np.uint64)).astype(x.dtype)
        out[offsets[i]:offsets[i + 1]] = c if inclusive else c - seg
        totals[i] = c[-1] if len(seg) else 0
    return out, totals


def _random_offsets(rng, n, n_seg):
    cuts = np.sort(rng.randint(0, n + 1, size=n_seg - 1))
    return np.concatenate([[0], cuts, [n]]).astype(np.int32)


@pytest.mark.parametrize("inclusive", [False, True])
@pytest.mark.parametrize("n,n_seg", [(1024, 1), (4096, 7), (100_003, 64),
                                     (1 << 17, 1000)])
def test_scan_segments_sweep(rng, n, n_seg, inclusive):
    x = rng.randint(0, 1000, size=n).astype(np.int32)
    off = _random_offsets(rng, n, n_seg)
    got, tot = sortx.scan_segments(jnp.asarray(x), jnp.asarray(off),
                                   with_totals=True, inclusive=inclusive)
    exp, etot = _oracle(x, off, inclusive)
    assert np.array_equal(np.asarray(got), exp)
    assert np.array_equal(np.asarray(tot), etot)


def test_scan_segments_empty_segments(rng):
    n = 10_000
    x = rng.randint(0, 100, size=n).astype(np.uint32)
    # lots of duplicate boundaries = empty segments
    off = np.array([0, 0, 0, 5000, 5000, 7000, n, n], dtype=np.int32)
    got, tot = sortx.scan_segments(jnp.asarray(x), jnp.asarray(off),
                                   with_totals=True)
    exp, etot = _oracle(x, off)
    assert np.array_equal(np.asarray(got), exp)
    assert np.array_equal(np.asarray(tot), etot)


def test_scan_segments_u32_wrap(rng):
    # Values near 2^32: sums must wrap mod 2^32 like the flat scan.
    n = 4096
    x = rng.randint(2**31, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    off = np.array([0, 1000, n], dtype=np.int32)
    got, tot = sortx.scan_segments(jnp.asarray(x), jnp.asarray(off),
                                   with_totals=True)
    exp = np.zeros_like(x)
    etot = np.zeros(2, np.uint32)
    for i, (a, b) in enumerate(((0, 1000), (1000, n))):
        c = np.cumsum(x[a:b], dtype=np.uint64) & 0xFFFFFFFF
        exp[a:b] = (c - x[a:b].astype(np.uint64)).astype(np.uint32)
        etot[i] = np.uint32(c[-1])
    assert np.array_equal(np.asarray(got), exp)
    assert np.array_equal(np.asarray(tot), etot)


def test_scan_segments_matches_flat_scan(rng):
    # One segment covering everything == the flat exclusive scan.
    n = 50_000
    x = rng.randint(0, 2**16, size=n).astype(np.uint32)
    off = np.array([0, n], dtype=np.int32)
    got = sortx.scan_segments(jnp.asarray(x), jnp.asarray(off))
    flat = sortx.scan(jnp.asarray(x))
    assert np.array_equal(np.asarray(got), np.asarray(flat))


def test_scan_segments_jit(rng):
    n = 8192
    x = rng.randint(0, 100, size=n).astype(np.int32)
    off = _random_offsets(rng, n, 16)
    f = jax.jit(lambda a, o: sortx.scan_segments(a, o, with_totals=True))
    got, tot = f(jnp.asarray(x), jnp.asarray(off))
    exp, etot = _oracle(x, off)
    assert np.array_equal(np.asarray(got), exp)
    assert np.array_equal(np.asarray(tot), etot)


def test_scan_segments_errors():
    with pytest.raises(TypeError):
        sortx.scan_segments(jnp.zeros(8, jnp.float32),
                            jnp.array([0, 8], jnp.int32))
    with pytest.raises(ValueError):
        sortx.scan_segments(jnp.zeros((4, 4), jnp.int32),
                            jnp.array([0, 16], jnp.int32))
    with pytest.raises(ValueError):
        sortx.scan_segments(jnp.zeros(8, jnp.int32),
                            jnp.array([0], jnp.int32))


def test_scan_segments_empty_input():
    x = jnp.zeros((0,), jnp.int32)
    off = jnp.array([0, 0, 0], jnp.int32)
    got, tot = sortx.scan_segments(x, off, with_totals=True)
    assert got.shape == (0,)
    assert np.array_equal(np.asarray(tot), np.zeros(2, np.int32))


def test_scan_by_key_basic(rng):
    """CUB ExclusiveSumByKey semantics: runs of EQUAL ADJACENT keys;
    a key reappearing later starts a new run."""
    keys = np.array([5, 5, 5, 2, 2, 5, 5, 9], np.uint32)
    vals = np.array([1, 2, 3, 4, 5, 6, 7, 8], np.uint32)
    got = np.asarray(sortx.scan_by_key(jnp.asarray(keys),
                                       jnp.asarray(vals)))
    exp = np.array([0, 1, 3, 0, 4, 0, 6, 0], np.uint32)
    assert np.array_equal(got, exp)
    got_i = np.asarray(sortx.scan_by_key(jnp.asarray(keys),
                                         jnp.asarray(vals),
                                         inclusive=True))
    assert np.array_equal(got_i, exp + vals)


@pytest.mark.parametrize("case", range(6))
def test_scan_by_key_fuzz(case):
    rng = np.random.RandomState(8100 + case)
    n = int(rng.randint(1, 30_000))
    keys = rng.randint(0, max(2, n // 50), size=n).astype(np.uint32)
    vals = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    got = np.asarray(sortx.scan_by_key(jnp.asarray(keys),
                                       jnp.asarray(vals)))
    # oracle: segmented running sum with resets at key changes
    exp = np.zeros_like(vals)
    acc = np.uint64(0)
    for i in range(n):
        if i > 0 and keys[i] == keys[i - 1]:
            acc += np.uint64(vals[i - 1])
        else:
            acc = np.uint64(0)
        exp[i] = np.uint32(acc & np.uint64(0xFFFFFFFF))
    assert np.array_equal(got, exp), (case, n)
    # float keys work too (equality-based)
    fkeys = keys.astype(np.float32)
    got_f = np.asarray(sortx.scan_by_key(jnp.asarray(fkeys),
                                         jnp.asarray(vals)))
    assert np.array_equal(got_f, exp)


def test_scan_by_key_validation():
    with pytest.raises(ValueError):
        sortx.scan_by_key(jnp.zeros(4, jnp.uint32),
                          jnp.zeros(5, jnp.uint32))
    with pytest.raises(TypeError):
        sortx.scan_by_key(jnp.zeros(4, jnp.uint32),
                          jnp.zeros(4, jnp.float32))
    assert sortx.scan_by_key(jnp.zeros(0, jnp.uint32),
                             jnp.zeros(0, jnp.uint32)).shape == (0,)
