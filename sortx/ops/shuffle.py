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

__all__ = ["build_piece_plan", "apply_runs", "CHUNK_ELEMS"]

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
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < count)
        def _():
            piece_dma(i + 1, jax.lax.rem(i + 1, 2)).start()

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
        out_specs=pl.BlockSpec((rows, LANES), lambda c, *_: (c, 0),
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
