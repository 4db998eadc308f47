"""Sanity tests of the golden oracle itself (vs numpy ground truth)."""

import numpy as np

from sortx import reference


def test_radix_sort_matches_numpy(rng):
    for n in (1, 7, 1024, 100_000):
        keys = rng.randint(0, 2**32, size=n, dtype=np.uint32)
        assert np.array_equal(reference.radix_sort(keys), np.sort(keys))


def test_radix_sort_partial_bits_stable(rng):
    keys = rng.randint(0, 2**32, size=4096, dtype=np.uint32)
    got = reference.radix_sort(keys, sort_bits=8)
    # Order by low byte; ties keep input order (stable).
    order = np.argsort(keys & 0xFF, kind="stable")
    assert np.array_equal(got, keys[order])


def test_radix_sort_kv_stable(rng):
    # Duplicate-heavy keys; values = original index proves stability
    # (UnitTest/main.cpp:152,165-166 recipe).
    keys = rng.randint(0, 16, size=10_000).astype(np.uint32)
    vals = np.arange(10_000, dtype=np.uint32)
    ks, vs = reference.radix_sort_kv(keys, vals)
    order = np.argsort(keys, kind="stable")
    assert np.array_equal(ks, keys[order])
    assert np.array_equal(vs, vals[order])


def test_exclusive_scan_wraps(rng):
    x = rng.randint(0, 2**32, size=1000, dtype=np.uint32)
    out, total = reference.exclusive_scan(x, with_total=True)
    acc = np.uint64(0)
    for i in range(1000):
        assert out[i] == np.uint32(acc & np.uint64(0xFFFFFFFF))
        acc += np.uint64(x[i])
    assert total == np.uint32(acc & np.uint64(0xFFFFFFFF))


def test_exclusive_scan_int32(rng):
    x = rng.randint(0, 16, size=512).astype(np.int32)
    out = reference.exclusive_scan(x)
    assert out.dtype == np.int32
    assert np.array_equal(out, (np.cumsum(x) - x).astype(np.int32))
