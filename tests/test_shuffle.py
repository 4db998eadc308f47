"""Run-mover tests: the receiver-driven scatter stage, standalone.

Verifies apply_runs against numpy for radix-style run permutations
(the exact movement pattern a sort pass needs), including skewed run
length distributions and chunk-boundary-straddling runs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sortx.ops.shuffle import CHUNK_ELEMS, apply_runs, build_piece_plan
from tests.conftest import on_tpu


def _numpy_apply(src, starts, dsts, lens, out_len):
    out = np.zeros(out_len, np.uint32)
    for s, d, L in zip(starts, dsts, lens):
        out[d:d + L] = src[s:s + L]
    return out


def _radix_run_set(rng, n, n_tiles, radix):
    """Build the run set of a radix partition: per-(tile,digit) segments
    of a tile-locally-grouped array, concatenated digit-major."""
    keys = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    tile = n // n_tiles
    digits = keys & (radix - 1)
    src = np.empty_like(keys)
    starts, dsts, lens = [], [], []
    # tile-local grouping (what the local-sort stage would produce)
    counts = np.zeros((n_tiles, radix), np.int64)
    for t in range(n_tiles):
        seg = keys[t * tile:(t + 1) * tile]
        order = np.argsort(seg & (radix - 1), kind="stable")
        src[t * tile:(t + 1) * tile] = seg[order]
        counts[t] = np.bincount(seg & (radix - 1), minlength=radix)
    # destination order (digit, tile)
    col_prefix = np.cumsum(counts.sum(axis=0)) - counts.sum(axis=0)
    tile_prefix = np.cumsum(counts, axis=0) - counts
    local_off = np.cumsum(counts, axis=1) - counts
    for d in range(radix):
        for t in range(n_tiles):
            L = counts[t, d]
            starts.append(t * tile + local_off[t, d])
            dsts.append(col_prefix[d] + tile_prefix[t, d])
            lens.append(L)
    return src, np.array(starts), np.array(dsts), np.array(lens), keys


def _interp():
    return not on_tpu()


def test_mover_simple_swap():
    n = 2 * CHUNK_ELEMS
    src = np.arange(n, dtype=np.uint32)
    starts = np.array([0, n // 2])
    dsts = np.array([n // 2, 0])
    lens = np.array([n // 2, n // 2])
    plan = build_piece_plan(starts, dsts, lens, n)
    got = np.asarray(apply_runs(jnp.asarray(src), plan, n,
                                interpret=_interp()))
    assert np.array_equal(got, _numpy_apply(src, starts, dsts, lens, n))


def test_mover_misaligned_ragged_runs(rng):
    n = 4 * CHUNK_ELEMS
    src = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    # random ragged partition of the output
    cuts = np.sort(rng.choice(np.arange(1, n), size=37, replace=False))
    bounds = np.concatenate([[0], cuts, [n]])
    lens = np.diff(bounds)
    dsts = bounds[:-1]
    # runs read from a shuffled order of the same segments
    perm = rng.permutation(len(lens))
    src_bounds = np.concatenate([[0], np.cumsum(lens[perm])])
    starts = np.empty_like(dsts)
    dsts2 = dsts[perm]
    starts[:] = 0
    s_, d_, l_ = [], [], []
    for i, p in enumerate(perm):
        s_.append(src_bounds[i])
        d_.append(dsts[p])
        l_.append(lens[p])
    starts, dsts, lens = np.array(s_), np.array(d_), np.array(l_)
    order = np.argsort(dsts)
    starts, dsts, lens = starts[order], dsts[order], lens[order]
    plan = build_piece_plan(starts, dsts, lens, n)
    got = np.asarray(apply_runs(jnp.asarray(src), plan, n,
                                interpret=_interp()))
    assert np.array_equal(got, _numpy_apply(src, starts, dsts, lens, n))


@pytest.mark.parametrize("radix,n_tiles", [(16, 4), (4, 8)])
def test_mover_radix_partition(rng, radix, n_tiles):
    """The real workload: a full radix-pass shuffle, verified bit-exact."""
    n = 8 * CHUNK_ELEMS
    src, starts, dsts, lens, keys = _radix_run_set(rng, n, n_tiles, radix)
    plan = build_piece_plan(starts, dsts, lens, n)
    got = np.asarray(apply_runs(jnp.asarray(src), plan, n,
                                interpret=_interp()))
    # the result must equal a full stable sort by the digit
    exp = keys[np.argsort(keys & (radix - 1), kind="stable")]
    assert np.array_equal(got, exp)


def test_mover_skewed_single_run(rng):
    """All data in one run (the all-equal-keys shuffle)."""
    n = 4 * CHUNK_ELEMS
    src = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    plan = build_piece_plan([0], [0], [n], n)
    got = np.asarray(apply_runs(jnp.asarray(src), plan, n,
                                interpret=_interp()))
    assert np.array_equal(got, src)


def test_mover_many_pieces_multicall(rng):
    """Plans above the SMEM cap split across kernel calls."""
    import sortx.ops.shuffle as sh
    old = sh._MAX_PIECES_PER_CALL
    sh._MAX_PIECES_PER_CALL = 16
    try:
        n = 8 * CHUNK_ELEMS
        src, starts, dsts, lens, keys = _radix_run_set(rng, n, 4, 16)
        plan = build_piece_plan(starts, dsts, lens, n)
        got = np.asarray(apply_runs(jnp.asarray(src), plan, n,
                                    interpret=_interp()))
        exp = keys[np.argsort(keys & 15, kind="stable")]
        assert np.array_equal(got, exp)
    finally:
        sh._MAX_PIECES_PER_CALL = old


# ---- v2 run mover (on-device plan) ----------------------------------------

def test_move_runs_basic_with_gaps(rng):
    """Runs with destination gaps: uncovered slots keep the fill."""
    from sortx.ops.shuffle import move_runs
    chunk = 2048
    out_len = 4 * chunk
    src = rng.randint(0, 2**32, size=6000, dtype=np.uint32)
    starts = np.array([100, 3000, 5000], np.int32)
    lens = np.array([900, 1500, 777], np.int32)
    dsts = np.array([50, 2000, 6000], np.int32)
    outs = move_runs((jnp.asarray(src),), jnp.asarray(starts),
                     jnp.asarray(dsts), jnp.asarray(lens), out_len,
                     fills=(0xFFFFFFFF,), chunk=chunk, interpret=_interp())
    exp = np.full(out_len, 0xFFFFFFFF, np.uint32)
    for s, d, L in zip(starts, dsts, lens):
        exp[d:d + L] = src[s:s + L]
    assert np.array_equal(np.asarray(outs[0]), exp)


def test_move_runs_two_streams_radix_plan(rng):
    """KV movement: both streams follow one plan, bit-exact."""
    from sortx.ops.shuffle import move_runs
    n, n_tiles, radix = 1 << 15, 4, 8
    src, starts, dsts, lens, _ = _radix_run_set(rng, n, n_tiles, radix)
    vals = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    chunk = 2048
    outs = move_runs((jnp.asarray(src), jnp.asarray(vals)),
                     jnp.asarray(starts.astype(np.int32)),
                     jnp.asarray(dsts.astype(np.int32)),
                     jnp.asarray(lens.astype(np.int32)), n,
                     chunk=chunk, interpret=_interp())
    assert np.array_equal(np.asarray(outs[0]),
                          _numpy_apply(src, starts, dsts, lens, n))
    assert np.array_equal(np.asarray(outs[1]),
                          _numpy_apply(vals, starts, dsts, lens, n))


def test_move_runs_empty_and_zero_len(rng):
    from sortx.ops.shuffle import move_runs
    chunk = 2048
    src = rng.randint(0, 2**32, size=4096, dtype=np.uint32)
    # zero-length runs interleaved with real ones
    starts = np.array([0, 10, 10, 2048], np.int32)
    lens = np.array([10, 0, 500, 0], np.int32)
    dsts = np.array([0, 10, 10, 600], np.int32)
    outs = move_runs((jnp.asarray(src),), jnp.asarray(starts),
                     jnp.asarray(dsts), jnp.asarray(lens), chunk,
                     chunk=chunk, interpret=_interp())
    exp = np.zeros(chunk, np.uint32)
    for s, d, L in zip(starts, dsts, lens):
        exp[d:d + L] = src[s:s + L]
    assert np.array_equal(np.asarray(outs[0]), exp)


def test_chunk_run_index_matches_bruteforce(rng):
    from sortx.ops.shuffle import chunk_run_index
    chunk = 1024
    out_len = 8 * chunk
    # random non-overlapping destination runs with gaps
    dsts, lens = [], []
    pos = 0
    while pos < out_len - 10:
        gap = int(rng.randint(0, 300))
        ln = int(rng.randint(0, 900))
        pos += gap
        if pos + ln > out_len:
            break
        dsts.append(pos)
        lens.append(ln)
        pos += ln
    dsts = np.array(dsts, np.int32)
    lens = np.array(lens, np.int32)
    first, count = chunk_run_index(jnp.asarray(dsts), jnp.asarray(lens),
                                   out_len, chunk)
    first, count = np.asarray(first), np.asarray(count)
    for c in range(out_len // chunk):
        lo, hi = c * chunk, (c + 1) * chunk
        hits = [i for i in range(len(dsts))
                if dsts[i] + lens[i] > lo and dsts[i] < hi]
        got = list(range(first[c], first[c] + count[c]))
        # got may include zero-length runs; every real hit must be covered
        for h in hits:
            assert h in got, (c, hits, got)
        for g in got:
            if lens[g] > 0:
                assert g in hits, (c, hits, got)
