"""Out-of-core sort + capacity contract (ops/out_of_core.py).

The reference transparently backs >max-alloc buffers in host memory
(Adl/CL/AdlCL.inl:373-378); sortx makes the capacity limit typed
(CapacityError) and provides sort_large / sort_kv_large: device-sorted
chunks + the native parallel k-way merge. CPU tests force multi-chunk
geometry with tiny chunk_elems; the 2^30 silicon run lives in
tools/verify_tpu.py's big-n stage.
"""

import numpy as np
import pytest

import sortx
from sortx.ops import out_of_core as oc
from sortx.runtime import native
from sortx.utils.errors import CapacityError

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="libsortx_host.so not built")


@needs_native
def test_host_merge_matches_numpy(rng):
    runs = [np.sort(rng.randint(0, 2**32, size=s, dtype=np.uint32))
            for s in (1000, 1, 0, 4096, 333)]
    keys = np.concatenate(runs)
    off = np.cumsum([0] + [len(r) for r in runs])
    got = native.host_merge(keys, off)
    assert np.array_equal(got, np.sort(keys))


@needs_native
def test_host_merge_kv_stable(rng):
    # Duplicate-heavy keys; values = global position. A stable merge
    # keeps run order (= position order) for equal keys.
    runs = []
    vals = []
    pos = 0
    for s in (2048, 1024, 3000):
        k = np.sort(rng.randint(0, 13, size=s).astype(np.uint32))
        runs.append(k)
        vals.append(np.arange(pos, pos + s, dtype=np.uint32))
        pos += s
    keys = np.concatenate(runs)
    off = np.cumsum([0] + [len(r) for r in runs])
    ko, vo = native.host_merge(keys, off, values=np.concatenate(vals))
    assert np.array_equal(ko, np.sort(keys))
    # Per-key groups must have ascending positions... but ONLY the runs
    # are sorted, not the concatenation; build the expected stable order
    # explicitly: within each key, elements in (run, within-run) order.
    order = np.argsort(keys, kind="stable")
    # argsort(stable) of the concatenated runs = run-major for equal
    # keys only if the within-run order matches; runs are sorted, so it
    # does for the merged comparator (key, run, pos).
    assert np.array_equal(vo, np.concatenate(vals)[order])


@needs_native
@pytest.mark.parametrize("dtype", [np.uint32, np.int32, np.float32])
def test_sort_large_multichunk(rng, dtype):
    n = 100_003
    if dtype == np.uint32:
        k = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    elif dtype == np.int32:
        k = rng.randint(-2**31, 2**31, size=n).astype(np.int32)
    else:
        k = rng.randn(n).astype(np.float32)
    got = sortx.sort_large(k, chunk_elems=1 << 14)
    assert got.dtype == dtype
    assert np.array_equal(got, np.sort(k))


@needs_native
def test_sort_large_descending_and_partial_bits(rng):
    n = 50_000
    k = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    got = sortx.sort_large(k, descending=True, chunk_elems=1 << 14)
    assert np.array_equal(got, np.sort(k)[::-1])
    got = sortx.sort_large(k, 12, chunk_elems=1 << 14)
    order = np.argsort(k & 0xFFF, kind="stable")
    assert np.array_equal(got, k[order])


@needs_native
def test_sort_kv_large_stable(rng):
    n = 80_000
    k = rng.randint(0, 50, size=n).astype(np.uint32)
    v = np.arange(n, dtype=np.uint32)
    ks, vs = sortx.sort_kv_large(k, v, chunk_elems=1 << 14)
    order = np.argsort(k, kind="stable")
    assert np.array_equal(ks, k[order])
    assert np.array_equal(vs, v[order])


@needs_native
def test_sort_kv_large_float_values(rng):
    n = 30_000
    k = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    v = rng.randn(n).astype(np.float32)
    ks, vs = sortx.sort_kv_large(k, v, chunk_elems=1 << 14)
    order = np.argsort(k, kind="stable")
    assert vs.dtype == np.float32
    assert np.array_equal(vs, v[order])


def test_sort_large_validation():
    with pytest.raises(ValueError):
        sortx.sort_large(np.zeros((4, 4), np.uint32))
    with pytest.raises(ValueError):
        sortx.sort_large(np.zeros(8, np.int32), 12)  # partial needs u32
    with pytest.raises(TypeError):
        sortx.sort_large(np.zeros(8, np.uint8))


def test_capacity_error_raised(monkeypatch):
    """A fake 1GB device limit turns an oversized sort into a typed
    CapacityError naming sort_large — never an opaque allocator OOM."""
    import jax

    class FakeDev:
        def memory_stats(self):
            return {"bytes_limit": 1 << 30}

    monkeypatch.setattr(jax, "devices", lambda *a: [FakeDev()])
    with pytest.raises(CapacityError, match="sort_large"):
        oc.check_device_capacity(1 << 28, 1)
    # Fits: no raise.
    oc.check_device_capacity(1 << 24, 1)
    assert oc.device_capacity_keys(1) == 1 << 26  # 0.9GB / 8B per key
