"""Full-Pallas bitonic sort engine — the TPU replacement for the
reference's SortAndScatterKernel pipeline (RadixSort32Kernels.cl:493-631).

Why a sorting network and not radix: this ISA has no scattered stores,
so the LSD rank-and-scatter loop that defines the reference cannot be
expressed; and XLA's own lax.sort tops out ~0.78 GKeys/s at 2^27 on
v5e regardless of batching (measured, scratch/r2_measure.py), so no
composition of lax.sort phases can beat the 520 MKeys/s baseline.
A bitonic network runs on exactly the operations this VPU is good at —
static-ish rolls, min/max, selects — and its cost is DATA-INDEPENDENT:
no skew fallback, no sampling, identical time for any distribution.

Structure (n = power of two, flat index i; classic iterative bitonic:
stage k = 2^s, layer distance d = 2^j, partner = i ^ d, direction
bit = (i >> s) & 1 — one rule for every stage including the last):

  kernel A   per-2^LOG_BLOCK block: ALL stages s <= LOG_BLOCK fused in
             one HBM pass (the global direction rule makes blocks come
             out alternately ascending/descending automatically).
  big-d      layers with d >= block size: pure-XLA reshape/min/max
             passes (pairs are contiguous at that granularity).
  kernel B   per-stage tail: layers d < block fused in one HBM pass;
             the stage index arrives as a traced scalar, so ONE
             compilation serves every stage.

Streams: the network moves N parallel u32 arrays under one comparator —
(key) for keys-only, (key, idx) for stable partial-bits, (key, idx,
value) for stable KV — compared lexicographically on the first
``num_keys`` streams (idx breaks ties => stability).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bitonic_sort_streams", "LOG_BLOCK"]

LANES = 128
LOG_LANES = 7
LOG_BLOCK = 18          # 2^18 u32 = 1MB per stream per block in VMEM


def _lex_lt(a, b, num_keys: int):
    """a < b on the first num_keys streams, lexicographic."""
    lt = a[0] < b[0]
    eq = a[0] == b[0]
    for t in range(1, num_keys):
        lt = lt | (eq & (a[t] < b[t]))
        if t < num_keys - 1:
            eq = eq & (a[t] == b[t])
    return lt


def _partner_lane(vals, d: int):
    """Partner values at flat distance d < 128 (lane axis), plus the
    is-low-of-pair mask. d static."""
    lane = jax.lax.broadcasted_iota(jnp.int32, vals[0].shape, 1)
    is_low = (lane & d) == 0
    up = [pltpu.roll(v, LANES - d, 1) for v in vals]   # brings x[i+d]
    dn = [pltpu.roll(v, d, 1) for v in vals]           # brings x[i-d]
    partner = [jnp.where(is_low, u, w) for u, w in zip(up, dn)]
    return partner, is_low


def _partner_rows(vals, r, rows: int):
    """Partner values at row distance r (traced scalar), is-low mask."""
    row = jax.lax.broadcasted_iota(jnp.int32, vals[0].shape, 0)
    is_low = (row & r) == 0
    up = [pltpu.roll(v, rows - r, 0) for v in vals]
    dn = [pltpu.roll(v, r, 0) for v in vals]
    partner = [jnp.where(is_low, u, w) for u, w in zip(up, dn)]
    return partner, is_low


def _exchange(vals, partner, is_low, desc, num_keys: int):
    """One compare-exchange: keep min at the low index of each pair when
    ascending (desc False), flipped when desc. desc: bool mask."""
    p_lt_v = _lex_lt(partner, vals, num_keys)
    # I should hold the partner iff (partner < me) == (I keep the min),
    # where I keep the min when (is_low != desc).
    take_partner = p_lt_v == (is_low != desc)
    return [jnp.where(take_partner, p, v) for p, v in zip(partner, vals)]


def _stage_tail(vals, flat, base, s, j_hi: int, rows: int, num_keys: int):
    """Layers j = j_hi..0 of stage s (s traced). Row layers run in a
    fori_loop with dynamic roll distances; the 7 lane layers unroll."""
    desc = ((base + flat) >> s) & 1
    desc = desc == 1

    if j_hi >= LOG_LANES:
        def body(t, vs):
            j = j_hi - t                      # j_hi .. 7
            r = jnp.int32(1) << (j - LOG_LANES)
            partner, is_low = _partner_rows(list(vs), r, rows)
            return tuple(_exchange(list(vs), partner, is_low, desc,
                                   num_keys))

        vals = list(jax.lax.fori_loop(0, j_hi - LOG_LANES + 1, body,
                                      tuple(vals)))

    for j in range(min(j_hi, LOG_LANES - 1), -1, -1):
        partner, is_low = _partner_lane(vals, 1 << j)
        vals = _exchange(vals, partner, is_low, desc, num_keys)
    return vals


def _kernel_a(*refs, log_block: int, num_streams: int, num_keys: int):
    """All stages s = 1..log_block for one block (alternating blocks)."""
    ins = refs[:num_streams]
    outs = refs[num_streams:]
    rows = 1 << (log_block - LOG_LANES)
    base = pl.program_id(0) * (1 << log_block)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    flat = row * LANES + lane
    vals = [r[...] for r in ins]

    # j_hi = s-1 is dynamic inside the stage loop: the row-layer count
    # is a traced fori bound, and the 7 lane layers always run with a
    # (j < s) no-op guard folded into the exchange mask.
    def stage_body(t, vs):
        s = t + 1
        desc = (((base + flat) >> s) & 1) == 1
        vs = list(vs)

        # row layers: j = s-1 down to 7 (dynamic count)
        def rbody(u, inner):
            j = s - 1 - u
            r = jnp.int32(1) << (j - LOG_LANES)
            partner, is_low = _partner_rows(list(inner), r, rows)
            return tuple(_exchange(list(inner), partner, is_low, desc,
                                   num_keys))

        n_row_layers = jnp.maximum(s - LOG_LANES, 0)
        vs = list(jax.lax.fori_loop(0, n_row_layers, rbody, tuple(vs)))

        # lane layers: j = min(s-1, 6) down to 0. Trip count varies with
        # s only for s <= 6; run all 7 with a no-op guard via masking:
        # for j >= s the layer must be skipped -> force take_partner
        # false by masking desc/is_low comparison with (j < s).
        for j in range(LOG_LANES - 1, -1, -1):
            partner, is_low = _partner_lane(vs, 1 << j)
            p_lt_v = _lex_lt(partner, vs, num_keys)
            take = (p_lt_v == (is_low != desc)) & (j < s)
            vs = [jnp.where(take, p, v) for p, v in zip(partner, vs)]
        return tuple(vs)

    vals = list(jax.lax.fori_loop(0, log_block, stage_body, tuple(vals)))
    for o, v in zip(outs, vals):
        o[...] = v


def _kernel_b(s_ref, *refs, log_block: int, num_streams: int,
              num_keys: int):
    """Stage s (traced scalar): in-block layers j = log_block-1 .. 0."""
    ins = refs[:num_streams]
    outs = refs[num_streams:]
    rows = 1 << (log_block - LOG_LANES)
    s = s_ref[0]
    base = pl.program_id(0) * (1 << log_block)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    flat = row * LANES + lane
    vals = [r[...] for r in ins]
    vals = _stage_tail(vals, flat, base, s, log_block - 1, rows, num_keys)
    for o, v in zip(outs, vals):
        o[...] = v


def _pallas_blocks(kernel, streams, log_block: int, num_keys: int,
                   interpret: bool, scalar=None):
    num_streams = len(streams)
    rows_total = streams[0].shape[0] * streams[0].shape[1] // LANES
    block_rows = 1 << (log_block - LOG_LANES)
    grid = rows_total // block_rows
    spec = pl.BlockSpec((block_rows, LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(kernel, log_block=log_block,
                             num_streams=num_streams, num_keys=num_keys)
    shapes = [jax.ShapeDtypeStruct((rows_total, LANES), jnp.uint32)
              ] * num_streams
    if scalar is None:
        out = pl.pallas_call(
            kern, grid=(grid,),
            in_specs=[spec] * num_streams,
            out_specs=[spec] * num_streams,
            out_shape=shapes, interpret=interpret)(*streams)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(grid,),
            in_specs=[spec] * num_streams,
            out_specs=[spec] * num_streams)
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=shapes, interpret=interpret)(scalar, *streams)
    return list(out)


def _xla_layer(streams, s: int, j: int, log_n: int, num_keys: int):
    """One big-distance layer in pure XLA: pairs (i, i^2^j) are d-apart
    contiguous chunks; direction = bit s. Shapes [A, 2, B, 2, C]:
    bit dims for s and j, everything fused into one elementwise pass."""
    b = 1 << (s - 1 - j)              # bits j+1..s-1
    c = 1 << j                        # bits < j
    outs = []
    if s == log_n:
        # Bit s does not exist (i < 2^log_n): uniformly ascending.
        vs = [x.reshape(b, 2, c) for x in streams]
        lo_side = [v[:, 0] for v in vs]
        hi_side = [v[:, 1] for v in vs]
        swap = _lex_lt(hi_side, lo_side, num_keys)
        for t in range(len(streams)):
            lo = jnp.where(swap, hi_side[t], lo_side[t])
            hi = jnp.where(swap, lo_side[t], hi_side[t])
            outs.append(jnp.stack([lo, hi], axis=1).reshape(
                streams[t].shape))
        return outs
    a = 1 << (log_n - s - 1)          # count of bits > s
    vs = [x.reshape(a, 2, b, 2, c) for x in streams]
    lo_side = [v[:, :, :, 0] for v in vs]
    hi_side = [v[:, :, :, 1] for v in vs]
    hs_lt_ls = _lex_lt(hi_side, lo_side, num_keys)
    asc_take = hs_lt_ls                  # ascending: low slot keeps min
    for t in range(len(streams)):
        lo = jnp.where(asc_take, hi_side[t], lo_side[t])
        hi = jnp.where(asc_take, lo_side[t], hi_side[t])
        # direction: dim 1 (bit s) == 1 -> descending -> swap roles
        first = jnp.stack([lo[:, 0], hi[:, 1]], axis=1)
        second = jnp.stack([hi[:, 0], lo[:, 1]], axis=1)
        outs.append(jnp.stack([first, second], axis=3).reshape(
            streams[t].shape))
    return outs


def bitonic_sort_streams(streams, num_keys: int, *, interpret: bool = False,
                         log_block: int = LOG_BLOCK):
    """Sort parallel u32 ``streams`` by the first ``num_keys`` streams
    (lexicographic), full bitonic network. len must be a power of two.

    Returns the streams reordered. Cost is data-independent.
    """
    n = streams[0].shape[0]
    log_n = n.bit_length() - 1
    if (1 << log_n) != n:
        raise ValueError("bitonic_sort_streams needs power-of-two length")
    lb = min(log_block, log_n)
    x = [s.reshape(-1, LANES) for s in streams]
    x = _pallas_blocks(_kernel_a, x, lb, num_keys, interpret)
    for s in range(lb + 1, log_n + 1):
        flat = [v.reshape(-1) for v in x]
        for j in range(s - 1, lb - 1, -1):
            flat = _xla_layer(flat, s, j, log_n, num_keys)
        x = [v.reshape(-1, LANES) for v in flat]
        x = _pallas_blocks(_kernel_b, x, lb, num_keys, interpret,
                           scalar=jnp.full((1,), s, jnp.int32))
    return tuple(v.reshape(-1) for v in x)
