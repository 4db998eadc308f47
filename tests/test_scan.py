"""Scan tests: Demo.Scan analog (UnitTest/main.cpp:172-213) + the 2^20 fix.

The reference FAILS at n=1024K (``Pprims.cpp:134-138`` hard cap); the
1024K (and larger) cases here are the regression tests proving we
out-scaled it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sortx
from sortx import reference
from tests.conftest import on_tpu, sweep_sizes

# Pallas-engine sweep sizes: full reference sweep on TPU; reduced under
# CPU interpret mode (the interpreter is orders of magnitude slower).
PALLAS_SIZES = sweep_sizes() + [1 << 20] if on_tpu() else [1024, 4096, 100_000]


def _cfg():
    if on_tpu():
        return sortx.Config(engine="pallas")
    return sortx.Config(engine="pallas", interpret=True,
                        scan_tile_elems=8192)


@pytest.mark.parametrize("n", sweep_sizes())
def test_scan_host_engine_sweep(rng, n):
    x = rng.randint(0, 16, size=n).astype(np.int32)  # main.cpp:183 range
    got = np.asarray(sortx.scan(jnp.asarray(x),
                                config=sortx.Config(engine="host")))
    assert np.array_equal(got, reference.exclusive_scan(x))


@pytest.mark.parametrize("n", PALLAS_SIZES)
def test_scan_pallas_sweep(rng, n):
    x = rng.randint(0, 16, size=n).astype(np.int32)
    got, total = sortx.scan(jnp.asarray(x), with_total=True, config=_cfg())
    exp, exp_total = reference.exclusive_scan(x, with_total=True)
    np.testing.assert_array_equal(np.asarray(got), exp)
    assert np.uint32(np.asarray(total)) == exp_total


def test_scan_1024k_passes(rng):
    """THE reference bug: n = 4096*256 = 2^20 returns garbage there."""
    n = 1 << 20
    x = rng.randint(0, 16, size=n).astype(np.int32)
    cfg = _cfg() if on_tpu() else sortx.Config(engine="host")
    got = np.asarray(sortx.scan(jnp.asarray(x), config=cfg))
    assert np.array_equal(got, reference.exclusive_scan(x))


def test_scan_u32_wraparound(rng):
    x = rng.randint(0, 2**32, size=4096, dtype=np.uint32)
    cfg = _cfg()
    got = np.asarray(sortx.scan(jnp.asarray(x), config=cfg))
    assert got.dtype == np.uint32
    assert np.array_equal(got, reference.exclusive_scan(x))


def test_scan_ragged_sizes(rng):
    for n in (1, 13, 127, 129, 1025, 40_000 + 7):
        x = rng.randint(0, 100, size=n).astype(np.int32)
        got = np.asarray(sortx.scan(jnp.asarray(x), config=_cfg()))
        assert np.array_equal(got, reference.exclusive_scan(x)), n


def test_scan_empty():
    x = jnp.zeros((0,), jnp.int32)
    out, total = sortx.scan(x, with_total=True)
    assert out.shape == (0,)
    assert int(total) == 0


def test_scan_rejects_bad_input():
    with pytest.raises(TypeError):
        sortx.scan(jnp.zeros((8,), jnp.float32))
    with pytest.raises(ValueError):
        sortx.scan(jnp.zeros((8, 8), jnp.int32))


def test_scan_inclusive(rng):
    x = rng.randint(0, 100, size=5000).astype(np.int32)
    got = np.asarray(sortx.scan(jnp.asarray(x), inclusive=True, config=_cfg()))
    assert np.array_equal(got, np.cumsum(x).astype(np.int32))
    got_h = np.asarray(sortx.scan(jnp.asarray(x), inclusive=True,
                                  config=sortx.Config(engine="host")))
    assert np.array_equal(got_h, np.cumsum(x).astype(np.int32))


def test_sortx_assert_debug_mode():
    from sortx.utils import SortxError, set_debug, sortx_assert
    set_debug(False)
    sortx_assert(False, "ignored in release")  # no-op
    set_debug(True)
    try:
        sortx_assert(1 + 1 == 2, "fine")
        import pytest as _pt
        with _pt.raises(SortxError):
            sortx_assert(False, "boom")
    finally:
        set_debug(False)


def test_scan_mxu_variant(rng):
    """MXU triangular-matmul cumsum variant is bit-exact."""
    cfg = (sortx.Config(engine="pallas", scan_use_mxu=True) if on_tpu()
           else sortx.Config(engine="pallas", scan_use_mxu=True,
                             interpret=True, scan_tile_elems=8192))
    for n in (4096, 100_000):
        x = rng.randint(0, 2**32, size=n, dtype=np.uint32)
        got = np.asarray(sortx.scan(jnp.asarray(x), config=cfg))
        assert np.array_equal(got, reference.exclusive_scan(x)), n
