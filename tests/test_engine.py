"""Hybrid sample-sort engine tests (ops/sort_pallas.py).

On CPU the Pallas mover runs in interpret mode with shrunken geometry so
multiple tiles/buckets/chunks are exercised; on TPU (SORTX_TEST_TPU=1)
the same cases compile the real kernels. These are the Demo.Sort32 /
Demo.SortKeyValue analogs (UnitTest/main.cpp:88-180) for the engine
specifically — plus the dispatch-honesty assertions from the round-1
verdict (engine="pallas" must actually trace the Pallas pipeline).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import sortx
from sortx.ops import sort_pallas as sp
from tests.conftest import on_tpu


def _cfg(**kw):
    if on_tpu():
        base = dict(engine="pallas", engine_min_n=0)
    else:
        # lb=14: interpret cost is ~linear in BLOCK COUNT (measured
        # ~0.5 s/block — kernel-call overhead dominates). Multi-stream
        # sorts shrink the effective block by ceil(log2(ns)), so kv/u64
        # tests still run 4-8 blocks here; 1-stream semantic tests run
        # 1-2. Deeper 1-stream block counts are pinned explicitly by
        # the keys sweep, the geometry tests below, and
        # test_default_geometry.
        base = dict(engine="pallas", interpret=True, engine_min_n=0,
                    engine_log_block=14,
                    engine_tile_elems=4096, engine_chunk_elems=2048)
    base.update(kw)
    return sortx.Config(**base)


def _hybrid_cfg():
    if on_tpu():
        return sortx.Config(engine="hybrid", engine_min_n=0)
    return sortx.Config(engine="hybrid", interpret=True, engine_min_n=0,
                        engine_tile_elems=4096, engine_chunk_elems=2048)


@pytest.mark.parametrize("n", [8192, 20_003])
def test_engine_keys_sweep(rng, n):
    k = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    got = np.asarray(sortx.sort(jnp.asarray(k), config=_cfg()))
    assert sp.last_dispatch == "bitonic"
    assert np.array_equal(got, np.sort(k))


@pytest.mark.slow
@pytest.mark.parametrize("n", [100_003, 1 << 17])
def test_engine_keys_sweep_big(rng, n):
    k = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    got = np.asarray(sortx.sort(jnp.asarray(k), config=_cfg()))
    assert np.array_equal(got, np.sort(k))


@pytest.mark.slow
def test_hybrid_engine_big(rng):
    k = rng.randint(0, 2**32, size=100_003, dtype=np.uint32)
    got = np.asarray(sortx.sort(jnp.asarray(k), config=_hybrid_cfg()))
    assert np.array_equal(got, np.sort(k))


def test_engine_kv_stability(rng):
    n = 12_000
    k = (rng.randint(0, 97, size=n) * 0x01000193).astype(np.uint32)
    v = np.arange(n, dtype=np.uint32)
    ks, vs = sortx.sort_kv(jnp.asarray(k), jnp.asarray(v), config=_cfg())
    assert sp.last_dispatch == "bitonic"
    order = np.argsort(k, kind="stable")
    assert np.array_equal(np.asarray(ks), k[order])
    assert np.array_equal(np.asarray(vs), v[order])


@pytest.mark.parametrize("sort_bits", [8, 20])
def test_engine_partial_bits(rng, sort_bits):
    n = 9_000
    k = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    got = np.asarray(sortx.sort(jnp.asarray(k), sort_bits, config=_cfg()))
    assert sp.last_dispatch == "bitonic"
    order = np.argsort(k & ((1 << sort_bits) - 1), kind="stable")
    assert np.array_equal(got, k[order])


def test_engine_partial_bits_kv(rng):
    n = 9_000
    k = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    v = np.arange(n, dtype=np.uint32)
    ks, vs = sortx.sort_kv(jnp.asarray(k), jnp.asarray(v), 8, config=_cfg())
    order = np.argsort(k & 255, kind="stable")
    assert np.array_equal(np.asarray(ks), k[order])
    assert np.array_equal(np.asarray(vs), v[order])


def test_engine_skew_fallback(rng):
    """Degenerate distributions overflow a bucket -> in-graph fallback."""
    n = 10_000
    for k in (np.full(n, 0xDEAD, np.uint32),
              rng.choice(np.array([3, 0xFFFFFFFF], np.uint32), size=n),
              np.sort(rng.randint(0, 2**32, n, dtype=np.uint32))[::-1]
              .copy()):
        got = np.asarray(sortx.sort(jnp.asarray(k), config=_cfg()))
        assert np.array_equal(got, np.sort(k)), "skew case"


def test_engine_float_and_int_keys(rng):
    n = 9_000
    f = rng.randn(n).astype(np.float32)
    got = np.asarray(sortx.sort(jnp.asarray(f), config=_cfg()))
    assert np.array_equal(got, np.sort(f))
    i = rng.randint(-2**31, 2**31, size=n).astype(np.int32)
    got = np.asarray(sortx.sort(jnp.asarray(i), config=_cfg()))
    assert np.array_equal(got, np.sort(i))


def test_engine_value_dtypes(rng):
    n = 9_000
    k = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    v = rng.randn(n).astype(np.float32)
    ks, vs = sortx.sort_kv(jnp.asarray(k), jnp.asarray(v), config=_cfg())
    order = np.argsort(k, kind="stable")
    assert np.asarray(vs).dtype == np.float32
    assert np.array_equal(np.asarray(vs), v[order])


def test_engine_dispatch_witness(rng):
    """engine='pallas'/'hybrid' trace Pallas kernels — never silent XLA."""
    from sortx.ops import bitonic as bt

    calls = []
    orig = bt.bitonic_sort_streams

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    k = rng.randint(0, 2**32, size=9_000, dtype=np.uint32)
    try:
        bt.bitonic_sort_streams = spy
        sp.bitonic_sort_streams = spy
        sortx.sort(jnp.asarray(k), config=_cfg())
    finally:
        bt.bitonic_sort_streams = orig
        sp.bitonic_sort_streams = orig
    assert sp.last_dispatch == "bitonic"
    assert len(calls) >= 1

    mcalls = []
    morig = sp.move_runs

    def mspy(*a, **kw):
        mcalls.append(1)
        return morig(*a, **kw)

    try:
        sp.move_runs = mspy
        sortx.sort(jnp.asarray(k), config=_hybrid_cfg())
    finally:
        sp.move_runs = morig
    assert sp.last_dispatch == "hybrid"
    assert len(mcalls) >= 2  # partition mover + compaction mover

    # Below the hard floor the dispatch honestly reports XLA.
    sortx.sort(jnp.asarray(k[:100]), config=_cfg())
    assert sp.last_dispatch == "xla-small"


@pytest.mark.parametrize("n", [20_003])
def test_hybrid_engine_keys_and_kv(rng, n):
    """The sample-sort+mover pipeline stays green as engine='hybrid'."""
    cfg = _hybrid_cfg()
    k = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    got = np.asarray(sortx.sort(jnp.asarray(k), config=cfg))
    assert sp.last_dispatch == "hybrid"
    assert np.array_equal(got, np.sort(k))
    kd = (rng.randint(0, 97, size=n) * 0x01000193).astype(np.uint32)
    v = np.arange(n, dtype=np.uint32)
    ks, vs = sortx.sort_kv(jnp.asarray(kd), jnp.asarray(v), config=cfg)
    order = np.argsort(kd, kind="stable")
    assert np.array_equal(np.asarray(ks), kd[order])
    assert np.array_equal(np.asarray(vs), v[order])


def test_hybrid_skew_fallback(rng):
    n = 10_000
    cfg = _hybrid_cfg()
    for k in (np.full(n, 0xDEAD, np.uint32),
              rng.choice(np.array([3, 0xFFFFFFFF], np.uint32), size=n)):
        got = np.asarray(sortx.sort(jnp.asarray(k), config=cfg))
        assert np.array_equal(got, np.sort(k))


def test_engine_auto_threshold(rng):
    """engine='auto' uses XLA below engine_min_n and says so."""
    k = jnp.asarray(rng.randint(0, 2**32, size=20_000, dtype=np.uint32))
    cfg = _cfg(engine="auto", engine_min_n=1 << 22)
    import jax
    if jax.default_backend() == "tpu":
        sortx.sort(k, config=cfg)
        assert sp.last_dispatch == "xla-small"


def test_engine_presorted_identity(rng):
    n = 9_000
    k = np.sort(rng.randint(0, 2**32, size=n, dtype=np.uint32))
    got = np.asarray(sortx.sort(jnp.asarray(k), config=_cfg()))
    assert np.array_equal(got, k)
    v = np.arange(n, dtype=np.uint32)
    ks, vs = sortx.sort_kv(jnp.asarray(k), jnp.asarray(v), config=_cfg())
    assert np.array_equal(np.asarray(vs), v)


def test_engine_ragged_ff_keys(rng):
    """Legit 0xffffffff keys must not be confused with pad slots."""
    n = 9_001
    k = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    k[rng.randint(0, n, 500)] = 0xFFFFFFFF
    v = np.arange(n, dtype=np.uint32)
    ks, vs = sortx.sort_kv(jnp.asarray(k), jnp.asarray(v), config=_cfg())
    order = np.argsort(k, kind="stable")
    assert np.array_equal(np.asarray(ks), k[order])
    assert np.array_equal(np.asarray(vs), v[order])


def test_bitonic_three_stream_32block_pass(rng):
    """Regression: 32-block kernel-D passes with 3 streams once used a
    non-power-of-two scratch chunk (85 rows) and skipped rows 85..127 of
    every span. Needs n >= 2^19 at lb=14 to reach a 32-block pass."""
    from sortx.ops.bitonic import bitonic_sort_streams

    n = 1 << 15
    k = rng.randint(0, 2**16, size=n).astype(np.uint32)
    idx = np.arange(n, dtype=np.uint32)
    v = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    interp = not on_tpu()
    # 3 streams at log_block=12 -> lb=10: stage 15 runs a 32-block
    # kernel-D pass (the geometry class that broke)
    ks, ix, vs = bitonic_sort_streams(
        (jnp.asarray(k), jnp.asarray(idx), jnp.asarray(v)), 2,
        interpret=interp, log_block=12)
    order = np.argsort(k, kind="stable")
    assert np.array_equal(np.asarray(ks), k[order])
    assert np.array_equal(np.asarray(vs), v[order])


def test_engine_u64_single_pass(rng):
    """64-bit sorts: engine path compares (hi, lo) lexicographically in
    ONE network pass (fallback: two LSD word passes)."""
    n = 9_000
    hi = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    lo = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    full = (hi.astype(np.uint64) << 32) | lo
    order = np.argsort(full, kind="stable")
    h2, l2 = sortx.sort_u64(jnp.asarray(hi), jnp.asarray(lo), config=_cfg())
    assert np.array_equal(np.asarray(h2), hi[order])
    assert np.array_equal(np.asarray(l2), lo[order])

    v = np.arange(n, dtype=np.uint32)
    h3, l3, v3 = sortx.sort_kv_u64(jnp.asarray(hi), jnp.asarray(lo),
                                   jnp.asarray(v), config=_cfg())
    assert np.array_equal(np.asarray(h3), hi[order])
    assert np.array_equal(np.asarray(l3), lo[order])
    assert np.array_equal(np.asarray(v3), v[order])


def test_engine_kv_unstable_option(rng):
    """stable=False: keys sorted, (key, value) multiset preserved; legit
    0xffffffff keys keep their values (pads must not displace them)."""
    n = 9_000
    k = (rng.randint(0, 97, size=n) * 0x01000193).astype(np.uint32)
    k[rng.randint(0, n, 300)] = 0xFFFFFFFF
    v = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    ks, vs = sortx.sort_kv(jnp.asarray(k), jnp.asarray(v), stable=False,
                           config=_cfg())
    ks, vs = np.asarray(ks), np.asarray(vs)
    assert np.all(ks[1:] >= ks[:-1])
    got = np.stack([ks, vs], 1)
    exp = np.stack([k, v], 1)
    assert np.array_equal(
        got[np.lexsort((got[:, 1], got[:, 0]))],
        exp[np.lexsort((exp[:, 1], exp[:, 0]))])


def test_engine_kv_unstable_pow2_keyonly_comparator(rng):
    """Exact power-of-two n takes the pad-free key-only-comparator
    branch (num_keys=1); the (key, value) pairing must still be a
    permutation of the input, including 0xffffffff keys."""
    n = 1 << 13
    k = (rng.randint(0, 97, size=n) * 0x01000193).astype(np.uint32)
    k[rng.randint(0, n, 300)] = 0xFFFFFFFF
    v = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    ks, vs = sortx.sort_kv(jnp.asarray(k), jnp.asarray(v), stable=False,
                           config=_cfg())
    ks, vs = np.asarray(ks), np.asarray(vs)
    assert np.all(ks[1:] >= ks[:-1])
    got = np.stack([ks, vs], 1)
    exp = np.stack([k, v], 1)
    assert np.array_equal(
        got[np.lexsort((got[:, 1], got[:, 0]))],
        exp[np.lexsort((exp[:, 1], exp[:, 0]))])
