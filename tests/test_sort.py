"""Keys-only sort tests: Demo.Sort32 analog (UnitTest/main.cpp:88-141)."""

import jax.numpy as jnp
import numpy as np
import pytest

import sortx
from sortx import reference
from tests.conftest import on_tpu, sweep_sizes


def _engines():
    engines = [sortx.Config(engine="host")]
    if on_tpu():
        engines.append(sortx.Config(engine="pallas"))
    return engines


@pytest.mark.parametrize("n", sweep_sizes())
def test_sort32_sweep(rng, n):
    # Keys uniform in [0, 0xffffffff] (UnitTest/main.cpp:122).
    keys = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    golden = reference.radix_sort(keys)
    for cfg in _engines():
        got = np.asarray(sortx.sort(jnp.asarray(keys), config=cfg))
        assert np.array_equal(got, golden), (cfg.engine, n)


def test_sort_ragged_sizes(rng):
    """No n%256 requirement (the reference asserts it, Pprims.cpp:327)."""
    for n in (1, 2, 13, 255, 257, 1000, 65537):
        keys = rng.randint(0, 2**32, size=n, dtype=np.uint32)
        golden = reference.radix_sort(keys)
        for cfg in _engines():
            got = np.asarray(sortx.sort(jnp.asarray(keys), config=cfg))
            assert np.array_equal(got, golden), (cfg.engine, n)


@pytest.mark.parametrize("sort_bits", [4, 8, 12, 16, 28, 32])
def test_sort_partial_bits(rng, sort_bits):
    """sortBits contract: order by low bits only, stable (Pprims.cpp:253)."""
    keys = rng.randint(0, 2**32, size=10_000, dtype=np.uint32)
    golden = reference.radix_sort(keys, sort_bits=sort_bits)
    for cfg in _engines():
        got = np.asarray(sortx.sort(jnp.asarray(keys), sort_bits, config=cfg))
        assert np.array_equal(got, golden), (cfg.engine, sort_bits)


def test_sort_skewed_distributions(rng):
    """Skew cases from BASELINE.json: all-equal and one-hot-bucket keys."""
    for keys in (
        np.full(100_000, 0xDEADBEEF, dtype=np.uint32),          # all equal
        np.zeros(65_536, dtype=np.uint32),                       # all zero
        (rng.randint(0, 2, size=100_000) * 0x80000000).astype(np.uint32),
        np.sort(rng.randint(0, 2**32, size=65_536, dtype=np.uint32)),
        np.sort(rng.randint(0, 2**32, size=65_536, dtype=np.uint32))[::-1].copy(),
    ):
        golden = reference.radix_sort(keys)
        for cfg in _engines():
            got = np.asarray(sortx.sort(jnp.asarray(keys), config=cfg))
            assert np.array_equal(got, golden), cfg.engine


def test_sort_int32_natural_order(rng):
    """int32 keys sort in natural signed order (beyond-reference)."""
    keys = rng.randint(-2**31, 2**31, size=4096).astype(np.int32)
    for cfg in _engines():
        got = np.asarray(sortx.sort(jnp.asarray(keys), config=cfg))
        assert np.array_equal(got, np.sort(keys))


def test_sort_float32_order(rng):
    """float32 keys sort in float order incl. negatives, zeros, infs."""
    keys = np.concatenate([
        rng.randn(4000).astype(np.float32) * 1e5,
        np.array([0.0, -0.0, np.inf, -np.inf, 1e-40, -1e-40], np.float32),
    ])
    for cfg in _engines():
        got = np.asarray(sortx.sort(jnp.asarray(keys), config=cfg))
        assert np.array_equal(got, np.sort(keys))


def test_sort_float32_kv_stability(rng):
    keys = rng.randint(0, 8, size=10_000).astype(np.float32)
    vals = np.arange(10_000, dtype=np.uint32)
    order = np.argsort(keys, kind="stable")
    for cfg in _engines():
        ks, vs = sortx.sort_kv(jnp.asarray(keys), jnp.asarray(vals),
                               config=cfg)
        assert np.array_equal(np.asarray(ks), keys[order])
        assert np.array_equal(np.asarray(vs), order.astype(np.uint32))


def test_sort_validates_args():
    with pytest.raises(TypeError):
        sortx.sort(jnp.zeros((8,), jnp.uint8))
    with pytest.raises(ValueError):
        sortx.sort(jnp.zeros((8,), jnp.uint32), sort_bits=0)
    with pytest.raises(ValueError):
        sortx.sort(jnp.zeros((8,), jnp.uint32), sort_bits=33)
    with pytest.raises(ValueError):
        # partial bits only defined for u32 (reference contract)
        sortx.sort(jnp.zeros((8,), jnp.int32), sort_bits=8)


def test_argsort_stable(rng):
    keys = rng.randint(0, 16, size=20_000).astype(np.uint32)
    perm = np.asarray(sortx.argsort(jnp.asarray(keys)))
    assert np.array_equal(perm, np.argsort(keys, kind="stable"))


def test_argsort_float(rng):
    keys = rng.randn(5000).astype(np.float32)
    perm = np.asarray(sortx.argsort(jnp.asarray(keys)))
    assert np.array_equal(keys[perm], np.sort(keys))


def test_argsort_engine_two_stream(rng):
    """Engine path: direct 2-stream (masked key, idx) network — stable,
    partial bits, presorted identity, float keys."""
    from tests.conftest import on_tpu

    cfg = (sortx.Config(engine="pallas", engine_min_n=0) if on_tpu()
           else sortx.Config(engine="pallas", interpret=True,
                             engine_min_n=0, engine_log_block=13))
    n = 12_288
    keys = rng.randint(0, 16, size=n).astype(np.uint32)
    perm = np.asarray(sortx.argsort(jnp.asarray(keys), config=cfg))
    assert np.array_equal(perm, np.argsort(keys, kind="stable"))

    ku = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    perm = np.asarray(sortx.argsort(jnp.asarray(ku), 8, config=cfg))
    assert np.array_equal(perm, np.argsort(ku & 255, kind="stable"))

    pre = np.sort(ku)
    perm = np.asarray(sortx.argsort(jnp.asarray(pre), config=cfg))
    assert np.array_equal(perm, np.arange(n))

    f = rng.randn(n).astype(np.float32)
    perm = np.asarray(sortx.argsort(jnp.asarray(f), config=cfg))
    assert np.array_equal(perm, np.argsort(f, kind="stable"))


def test_sort_u64(rng):
    n = 30_000
    hi = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    lo = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    shi, slo = sortx.sort_u64(jnp.asarray(hi), jnp.asarray(lo))
    full = (hi.astype(np.uint64) << 32) | lo
    exp = np.sort(full)
    got = (np.asarray(shi).astype(np.uint64) << 32) | np.asarray(slo)
    assert np.array_equal(got, exp)


def test_sort_kv_u64_stability(rng):
    n = 20_000
    hi = rng.randint(0, 4, size=n).astype(np.uint32)
    lo = rng.randint(0, 4, size=n).astype(np.uint32)
    vals = np.arange(n, dtype=np.uint32)
    shi, slo, svals = sortx.sort_kv_u64(
        jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(vals))
    full = (hi.astype(np.uint64) << 32) | lo
    order = np.argsort(full, kind="stable")
    assert np.array_equal(np.asarray(shi), hi[order])
    assert np.array_equal(np.asarray(slo), lo[order])
    assert np.array_equal(np.asarray(svals), vals[order])


def test_sort_reverse_sorted_fast_path(rng):
    """Descending inputs (with ties) flip via the adaptive path."""
    base = np.sort(rng.randint(0, 64, size=50_000).astype(np.uint32))
    desc = base[::-1].copy()
    for cfg in _engines():
        got = np.asarray(sortx.sort(jnp.asarray(desc), config=cfg))
        assert np.array_equal(got, base), cfg.engine


def test_sort_u64_validates_dtype():
    """ADVICE.md: i32 halves would sort per-word in signed order — reject."""
    with pytest.raises(TypeError):
        sortx.sort_u64(jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32))


@pytest.mark.parametrize("sort_bits", [8, 19, 20])
def test_partial_bits_packed_tiebreak_engine(rng, sort_bits):
    """Round-5 (VERDICT item 2a): sort_bits + log_n <= 32 packs the
    stability tie-break into the key stream's spare bits (one tie-free
    composite stream). n=8192 -> log_n 13: bits=8 packs, bits=19 packs
    at the exact 32-bit boundary, bits=20 takes the 3-stream path —
    all must match the golden oracle bit-for-bit."""
    from sortx.ops import sort_pallas as sp

    n = 8192                          # pow2: exercises the no-pad edge
    assert sp.packed_partial(n, 8) and sp.packed_partial(n, 19)
    assert not sp.packed_partial(n, 20)
    keys = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    golden = reference.radix_sort(keys, sort_bits)
    cfg = sortx.Config(engine="pallas", interpret=True, engine_min_n=0,
                       engine_log_block=12)
    got = np.asarray(sortx.sort(jnp.asarray(keys), sort_bits, config=cfg))
    assert np.array_equal(got, golden)


def test_partial_bits_packed_kv_all_masked_equal(rng):
    """Adversarial for the packed composite: every masked key equal AND
    at the mask maximum (composite = mask<<k | idx, the largest real
    values), pow2 n. Stability must equal input order; values follow."""
    n = 4096
    sort_bits = 6
    keys = (rng.randint(0, 2**26, size=n).astype(np.uint32) << 6) \
        | np.uint32(63)
    vals = np.arange(n, dtype=np.uint32)
    gk, gv = reference.radix_sort_kv(keys, vals, sort_bits)
    cfg = sortx.Config(engine="pallas", interpret=True, engine_min_n=0,
                       engine_log_block=12)
    ks, vs = sortx.sort_kv(jnp.asarray(keys), jnp.asarray(vals),
                           sort_bits, config=cfg)
    assert np.array_equal(np.asarray(ks), gk)
    assert np.array_equal(np.asarray(vs), gv)
