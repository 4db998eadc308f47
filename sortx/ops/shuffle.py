"""Receiver-driven run mover — the scatter stage of a radix pass.

The reference scatters with per-work-item LDS writes
(``SortAndScatterKernel``, ``RadixSort32Kernels.cl:609-621``); this ISA
has no vector scatter and DMA slices must be 1024-element aligned
(docs/DESIGN_NOTES.md), so the TPU-native formulation inverts control:
the grid iterates over ALIGNED OUTPUT CHUNKS, and each chunk gathers the
"pieces" of source runs that land in it — DMA the aligned cover of a
piece into VMEM, realign with a dynamic flat roll, mask, accumulate.
All writes are aligned and disjoint: no ordering hazards, no overlap.

``apply_runs(src, plan)`` applies an arbitrary run-concatenation
permutation: given runs (src_start, dst_start, length) that tile the
output, produce out[dst:dst+len] = src[s:s+len] for every run. This is
exactly the data movement of a radix-pass shuffle (runs = per-(tile,
digit) segments in destination order), shipped and tested standalone so
the future engine can drop it in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.math import cdiv

LANES = 128
ALIGN = 1024          # DMA tiling granule for 32-bit data (measured)

__all__ = ["build_piece_plan", "apply_runs", "CHUNK_ELEMS",
           "chunk_run_index", "move_runs"]

CHUNK_ELEMS = 1 << 13  # output chunk (8192 elems = 32KB)


def build_piece_plan(src_starts, dst_starts, lengths, out_len: int,
                     chunk: int = CHUNK_ELEMS):
    """Split runs into per-output-chunk pieces (vectorized, numpy).

    Runs must tile [0, out_len) in destination order (dst_starts sorted,
    contiguous). Returns dict of int32 arrays:
      piece_src, piece_dst_off (within chunk), piece_len, chunk_first,
      chunk_count  — where piece i of chunk c covers
      out[c*chunk + dst_off : +len] = src[piece_src : +len].
    """
    src_starts = np.asarray(src_starts, np.int64)
    dst_starts = np.asarray(dst_starts, np.int64)
    lengths = np.asarray(lengths, np.int64)
    keep = lengths > 0
    src_starts, dst_starts, lengths = (src_starts[keep], dst_starts[keep],
                                       lengths[keep])
    order = np.argsort(dst_starts, kind="stable")  # destination order
    src_starts, dst_starts, lengths = (src_starts[order], dst_starts[order],
                                       lengths[order])
    n_chunks = cdiv(out_len, chunk)
    # Number of chunk boundaries a run crosses -> pieces per run.
    first_chunk = dst_starts // chunk
    last_chunk = (dst_starts + lengths - 1) // chunk
    pieces_per_run = (last_chunk - first_chunk + 1).astype(np.int64)
    total = int(pieces_per_run.sum())
    run_of_piece = np.repeat(np.arange(len(lengths)), pieces_per_run)
    # Index of this piece within its run.
    first_piece_of_run = np.concatenate(
        [[0], np.cumsum(pieces_per_run)[:-1]])
    k = np.arange(total) - first_piece_of_run[run_of_piece]
    # Piece destination range = run ∩ chunk.
    run_dst = dst_starts[run_of_piece]
    run_src = src_starts[run_of_piece]
    run_len = lengths[run_of_piece]
    piece_chunk = first_chunk[run_of_piece] + k
    p_begin = np.maximum(run_dst, piece_chunk * chunk)
    p_end = np.minimum(run_dst + run_len, (piece_chunk + 1) * chunk)
    piece_len = p_end - p_begin
    piece_src = run_src + (p_begin - run_dst)
    piece_dst_off = p_begin - piece_chunk * chunk
    # Per-chunk piece ranges (pieces are in destination order already).
    chunk_first = np.searchsorted(piece_chunk, np.arange(n_chunks),
                                  side="left")
    chunk_count = np.searchsorted(piece_chunk, np.arange(n_chunks),
                                  side="right") - chunk_first
    return {
        "piece_src": piece_src.astype(np.int32),
        "piece_dst_off": piece_dst_off.astype(np.int32),
        "piece_len": piece_len.astype(np.int32),
        "chunk_first": chunk_first.astype(np.int32),
        "chunk_count": chunk_count.astype(np.int32),
    }


def _flat_roll_right(x, s):
    """Circular right-roll of a (rows,128) block by a dynamic flat amount:
    out[flat j] = x[(j - s) mod size]. s is a traced scalar in [0, size)."""
    qr = s // LANES
    ql = s % LANES
    y = pltpu.roll(x, qr, 0)
    a = pltpu.roll(y, ql, 1)              # lane part, no row carry
    b = pltpu.roll(pltpu.roll(y, 1, 0), ql, 1)  # with one extra row shift
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= ql, a, b)


def _mover_kernel(piece_src, piece_dst, piece_len, chunk_first, chunk_count,
                  src_hbm, out_ref, scratch, sem, *, chunk: int):
    c = pl.program_id(0)
    rows = chunk // LANES
    cov_rows = rows + ALIGN // LANES          # piece cover upper bound
    first = chunk_first[c]
    count = chunk_count[c]
    out_ref[...] = jnp.zeros_like(out_ref)

    # Double-buffered piece DMAs: start piece i+1 into the other slot
    # before processing piece i, hiding the per-piece DMA latency (which
    # dominated the serial version: ~0.8us x pieces).
    def piece_dma(i, slot):
        s = piece_src[first + i]
        cover = (s // ALIGN) * ALIGN          # aligned DMA start
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(cover // LANES, cov_rows), :],
            scratch.at[slot], sem.at[slot])

    @pl.when(count > 0)
    def _():
        piece_dma(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, jnp.int32(2))

        @pl.when(i + 1 < count)
        def _():
            piece_dma(i + 1, jax.lax.rem(i + 1, jnp.int32(2))).start()

        piece_dma(i, slot).wait()
        p = first + i
        s = piece_src[p]
        doff = piece_dst[p]
        plen = piece_len[p]
        head = s - (s // ALIGN) * ALIGN       # misalignment within cover
        block = scratch[slot]
        # Move source element (head + j) to flat position (doff + j):
        # right-roll by (doff - head) mod cover_size.
        size = cov_rows * LANES
        shift = (doff - head) % size
        rolled = _flat_roll_right(block, shift)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (cov_rows, LANES), 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (cov_rows, LANES), 1)
        flat = row_i * LANES + lane_i
        mask = (flat >= doff) & (flat < doff + plen)
        contrib = jnp.where(mask, rolled, 0)
        out_ref[...] = out_ref[...] | contrib[:rows, :]
        return 0

    jax.lax.fori_loop(0, count, body, 0)


@functools.partial(jax.jit, static_argnames=("out_len", "chunk",
                                             "interpret"))
def _apply_runs_jit(src_padded, piece_src, piece_dst_off, piece_len,
                    chunk_first, chunk_count, *, out_len: int,
                    chunk: int, interpret: bool):
    n_chunks = out_len // chunk
    rows = chunk // LANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((rows, LANES), lambda c, *_: (c, np.int32(0)),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows + ALIGN // LANES, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_mover_kernel, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_len // LANES, LANES),
                                       jnp.uint32),
        interpret=interpret,
    )(piece_src, piece_dst_off, piece_len, chunk_first, chunk_count,
      src_padded)
    return out.reshape(-1)


# Scalar-prefetch lives in SMEM (1MB); cap pieces per kernel invocation.
_MAX_PIECES_PER_CALL = 40_000


def apply_runs(src, plan, out_len: int, *, chunk: int = CHUNK_ELEMS,
               interpret: bool = False):
    """Apply a run-concatenation permutation (see module docstring).

    ``src``: 1D uint32. ``plan``: dict from build_piece_plan. ``out_len``
    must be a multiple of ``chunk`` (pad the run set accordingly).
    Large plans are split over several kernel calls on disjoint chunk
    ranges (the piece arrays ride in SMEM, which holds only ~1 MB).
    """
    if out_len % chunk:
        raise ValueError("out_len must be a multiple of chunk")
    # Pad source so aligned covers never read out of bounds.
    pad = ALIGN + chunk
    total = cdiv(src.shape[0] + pad, ALIGN) * ALIGN
    src_padded = jnp.pad(src, (0, total - src.shape[0])).reshape(-1, LANES)

    chunk_first = np.asarray(plan["chunk_first"])
    chunk_count = np.asarray(plan["chunk_count"])
    n_chunks = out_len // chunk
    n_pieces = len(plan["piece_src"])
    if n_pieces <= _MAX_PIECES_PER_CALL:
        return _apply_runs_jit(
            src_padded,
            jnp.asarray(plan["piece_src"]),
            jnp.asarray(plan["piece_dst_off"]),
            jnp.asarray(plan["piece_len"]),
            jnp.asarray(chunk_first), jnp.asarray(chunk_count),
            out_len=out_len, chunk=chunk, interpret=interpret)

    # Greedy chunk-group partition with <= cap pieces per group.
    outs = []
    c0 = 0
    while c0 < n_chunks:
        c1 = c0
        p0 = int(chunk_first[c0])
        while c1 < n_chunks:
            pieces = int(chunk_first[c1]) + int(chunk_count[c1]) - p0
            if pieces > _MAX_PIECES_PER_CALL and c1 > c0:
                break
            c1 += 1
        p1 = (int(chunk_first[c1 - 1]) + int(chunk_count[c1 - 1]))
        sub_len = (c1 - c0) * chunk
        outs.append(_apply_runs_jit(
            src_padded,
            jnp.asarray(plan["piece_src"][p0:p1]),
            jnp.asarray(plan["piece_dst_off"][p0:p1]),
            jnp.asarray(plan["piece_len"][p0:p1]),
            jnp.asarray(chunk_first[c0:c1] - p0),
            jnp.asarray(chunk_count[c0:c1]),
            out_len=sub_len, chunk=chunk, interpret=interpret))
        c0 = c1
    return jnp.concatenate(outs)


# ---------------------------------------------------------------------------
# v2 mover: run-level plan built ON DEVICE (the round-2 engine's scatter).
#
# The v1 mover above takes a host-built numpy piece plan, which would force
# a host sync inside a sort (round-1 VERDICT: the reference enqueues its
# whole 24-kernel pipeline with zero host round-trips, Pprims.cpp:357-397).
# v2 takes whole RUNS (src/dst/len int32 arrays, destination-sorted) as
# traced device arrays; the per-chunk run index is two searchsorted calls,
# and the kernel intersects runs with its output chunk on the scalar core.
# Extras over v1: N parallel streams (key-value moves share one plan and
# the scalar overhead), a fill value for slots no run covers (pad regions
# sort to a known end), and a deeper multi-slot DMA pipeline.


def chunk_run_index(run_dst, run_len, out_len: int, chunk: int):
    """First-run index + run count intersecting each output chunk.

    Runs must be destination-sorted and non-overlapping (gaps allowed —
    uncovered output keeps the fill value). All on-device: two
    searchsorted calls over the run table.
    """
    run_dst = run_dst.astype(jnp.int32)
    ends = run_dst + run_len.astype(jnp.int32)
    c = jnp.arange(out_len // chunk, dtype=jnp.int32) * chunk
    first = jnp.searchsorted(ends, c, side="right").astype(jnp.int32)
    last = jnp.searchsorted(run_dst, c + chunk, side="left").astype(
        jnp.int32)
    return first, jnp.maximum(last - first, 0)


def _runs_mover_kernel(run_src, run_dst, run_len, chunk_first, chunk_count,
                       *refs, chunk: int, n_streams: int, slots: int,
                       fills):
    srcs = refs[:n_streams]
    outs = refs[n_streams:2 * n_streams]
    scratches = refs[2 * n_streams:3 * n_streams]
    sem = refs[3 * n_streams]
    c = pl.program_id(0)
    rows = chunk // LANES
    cov_rows = rows + ALIGN // LANES
    size = cov_rows * LANES
    base = c * chunk
    first = chunk_first[c]
    count = chunk_count[c]
    for st in range(n_streams):
        outs[st][...] = jnp.full_like(outs[st], jnp.uint32(fills[st]))

    def dmas(i, slot):
        r = first + i
        s = run_src[r]
        d = run_dst[r]
        p_begin = jnp.maximum(d, base)
        src_at = s + (p_begin - d)
        cover = (src_at // ALIGN) * ALIGN
        return [pltpu.make_async_copy(
            srcs[st].at[pl.ds(cover // LANES, cov_rows), :],
            scratches[st].at[slot], sem.at[slot, st])
            for st in range(n_streams)]

    for k in range(slots - 1):
        @pl.when(k < count)
        def _(k=k):
            for dma in dmas(k, k):
                dma.start()

    def body(i, _):
        slot = jax.lax.rem(i, jnp.int32(slots))

        @pl.when(i + slots - 1 < count)
        def _():
            nxt = i + slots - 1
            for dma in dmas(nxt, jax.lax.rem(nxt, jnp.int32(slots))):
                dma.start()

        for dma in dmas(i, slot):
            dma.wait()
        r = first + i
        s = run_src[r]
        d = run_dst[r]
        ln = run_len[r]
        p_begin = jnp.maximum(d, base)
        p_end = jnp.minimum(d + ln, base + chunk)
        plen = p_end - p_begin            # <= 0 for empty runs: no-op mask
        src_at = s + (p_begin - d)
        head = src_at - (src_at // ALIGN) * ALIGN
        doff = p_begin - base
        shift = jax.lax.rem(doff - head + size, jnp.int32(size))
        row_i = jax.lax.broadcasted_iota(jnp.int32, (cov_rows, LANES), 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (cov_rows, LANES), 1)
        flat = row_i * LANES + lane_i
        mask = ((flat >= doff) & (flat < doff + plen))[:rows, :]
        for st in range(n_streams):
            rolled = _flat_roll_right(scratches[st][slot], shift)
            outs[st][...] = jnp.where(mask, rolled[:rows, :], outs[st][...])
        return 0

    jax.lax.fori_loop(0, count, body, 0)


@functools.partial(jax.jit, static_argnames=("out_len", "chunk", "slots",
                                             "fills", "interpret"))
def _move_runs_jit(srcs_padded, run_src, run_dst, run_len, chunk_first,
                   chunk_count, *, out_len: int, chunk: int, slots: int,
                   fills, interpret: bool):
    n_streams = len(srcs_padded)
    n_chunks = out_len // chunk
    rows = chunk // LANES
    cov_rows = rows + ALIGN // LANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_streams,
        out_specs=[pl.BlockSpec((rows, LANES), lambda c, *_: (c, np.int32(0)),
                                memory_space=pltpu.VMEM)] * n_streams,
        scratch_shapes=(
            [pltpu.VMEM((slots, cov_rows, LANES), jnp.uint32)] * n_streams
            + [pltpu.SemaphoreType.DMA((slots, n_streams))]),
    )
    outs = pl.pallas_call(
        functools.partial(_runs_mover_kernel, chunk=chunk,
                          n_streams=n_streams, slots=slots, fills=fills),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((out_len // LANES, LANES),
                                        jnp.uint32)] * n_streams,
        interpret=interpret,
    )(run_src, run_dst, run_len, chunk_first, chunk_count, *srcs_padded)
    return tuple(o.reshape(-1) for o in outs)


def move_runs(srcs, run_src, run_dst, run_len, out_len: int, *,
              fills=None, chunk: int = CHUNK_ELEMS, slots: int = 4,
              interpret: bool = False):
    """Move runs out[d:d+l] = src[s:s+l] for every (s, d, l) run — fully
    jittable (runs are traced arrays; the plan lives on device).

    Args:
      srcs: tuple of 1D uint32 arrays (parallel streams moved with one
        shared plan — e.g. keys + values).
      run_src/run_dst/run_len: int32 [R]; destination-sorted,
        non-overlapping destinations; gaps keep ``fills``.
      out_len: multiple of ``chunk``.
      fills: per-stream uint32 fill for uncovered output (default 0).

    Returns: tuple of 1D uint32 [out_len] arrays.
    """
    if out_len % chunk:
        raise ValueError("out_len must be a multiple of chunk")
    if not isinstance(srcs, (tuple, list)):
        srcs = (srcs,)
    fills = tuple(int(f) for f in (fills or (0,) * len(srcs)))
    if len(fills) != len(srcs):
        raise ValueError("one fill per stream")
    pad = ALIGN + chunk
    total = cdiv(srcs[0].shape[0] + pad, ALIGN) * ALIGN
    padded = tuple(
        jnp.pad(s, (0, total - s.shape[0])).reshape(-1, LANES)
        for s in srcs)
    chunk_first, chunk_count = chunk_run_index(run_dst, run_len, out_len,
                                               chunk)
    return _move_runs_jit(
        padded, run_src.astype(jnp.int32), run_dst.astype(jnp.int32),
        run_len.astype(jnp.int32), chunk_first, chunk_count,
        out_len=out_len, chunk=chunk, slots=slots, fills=fills,
        interpret=interpret)
