"""Full-Pallas bitonic sort engine — the TPU replacement for the
reference's SortAndScatterKernel pipeline (RadixSort32Kernels.cl:493-631).

Why a sorting network and not radix: this ISA has no scattered stores,
so the LSD rank-and-scatter loop that defines the reference cannot be
expressed; and XLA's own lax.sort tops out ~0.78 GKeys/s at 2^27 on
v5e regardless of batching (measured, scratch/r2_measure.py), so no
composition of lax.sort phases can beat the 520 MKeys/s baseline.
A bitonic network runs on exactly the operations this VPU is good at —
static rolls, slices, min/max, selects — and its cost is
DATA-INDEPENDENT: no skew sampling, no fallback, identical time for
any distribution.

Classic iterative bitonic over flat index i (n a power of two):
stage k = 2^s, layer distance d = 2^j (j = s-1..0), partner = i ^ d,
direction bit = (i >> s) & 1 — one rule for every stage including the
last. Layers are STATIC (v1's dynamic-distance rolls lowered to
log-step select chains and ran 3x slow — measured):

  kernel A   stages s <= log_block fused per VMEM block, 1 HBM pass.
  kernel B   stage tail: layers j < log_block, one HBM pass; the stage
             index is a traced scalar => ONE compilation serves all
             stages (direction is its only use).
  kernel D   layers j >= log_block, fused in groups of <= _d_fuse(ns):
             2^L interacting sub-blocks via index-mapped BlockSpecs,
             pure min/max exchanges (no rolls at this granularity).

Per-layer forms (rows = block/128):
  j >= 10    "slice trick": reshape [G, 2, d_rows, 128], exchange the
             halves — zero roll/permute work;
  7<=j<=9    static sublane rolls (d_rows in {1,2,4} — too fine to
             slice on the 8-sublane granule);
  j < 7      static lane rolls.

Two transforms are folded into one per-stage xor mask on the key
streams (kernels A/B), so every layer runs a plain ASCENDING signed
comparator with no per-layer direction work:
  - direction: complementing every key stream exactly reverses the
    lexicographic order, so descending regions are complemented instead
    of flipping the comparator;
  - signedness: Mosaic only legalizes SIGNED vector min/max
    (arith.minui fails to legalize — measured), and u32 order equals
    i32 order on x ^ 0x80000000, so the sign bit rides the same mask.
Keys-only layers then collapse to pure min/max with no comparison
(measured: 144.5 -> 134.8 ms at 2^27 = 0.996 GK/s; stable KV
440 -> 402 ms).

Streams: the network moves N parallel u32 arrays under one comparator,
lexicographic on the first ``num_keys`` streams — (key) keys-only,
(masked, idx, full) partial-bits, (key, idx, value) stable KV.

Ragged n prunes pad-only work by extent tracking (see
``bitonic_sort_streams``): worst-case ragged (n = 2^k + 1) costs ~half
the padded network instead of double (measured: 2^26+2^20 keys sort in
88 ms = 0.774 GK/s vs ~135 ms had the 2^27-padded network run).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..runtime.launcher import profile_call

__all__ = ["bitonic_sort_streams", "bitonic_merge_streams", "LOG_BLOCK"]

LANES = 128
LOG_LANES = 7
# 2^17 u32 = 512KB per stream per block: the unrolled static-layer chain
# holds several live block temporaries; Mosaic's scoped-vmem stack
# accounting rejects 2^18 blocks (24MB > 16MB limit, measured). 2^17
# beats 2^16 once stage tails run transposed (81.7 vs 86.5 ms at 2^27).
LOG_BLOCK = 17
_SLICE_MIN_J = 10       # d_rows >= 8: sublane-granular slicing works
_SIGN = -(1 << 31)      # i32 sign bit: u32 order == i32 order on x^SIGN


def _d_fuse(ns: int) -> int:
    """Kernel-D layers fused per pass, by stream count.

    Re-measured round 4 at 2^27 on v5e (transposed-tails + lb17
    regime; scratch/r4_dfuse_sweep*.py): 1-2 streams win at 8 —
    keys 67.2 -> 64.4 ms, kv-unstable 157.7 -> 155.2, u64 175.8 ->
    172.9 — while 3 streams REGRESS (stable KV 235.1 -> 242.9 ms):
    deeper fusion holds more live per-stream temporaries per pass.
    (The round-2 figure "6 beats 5" predates the transposed tails.)
    """
    return 8 if ns <= 2 else 6


def _lex_lt(a, b, num_keys: int):
    """a < b on the first num_keys streams, lexicographic."""
    lt = a[0] < b[0]
    eq = a[0] == b[0]
    for t in range(1, num_keys):
        lt = lt | (eq & (a[t] < b[t]))
        if t < num_keys - 1:
            eq = eq & (a[t] == b[t])
    return lt


def _layer(vals, j: int, num_keys: int, rows: int,
           tie_break: bool = False):
    """One static ASCENDING compare-exchange layer at distance 2^j.

    Direction is folded into the values by the callers (kernels A/B
    complement the key streams wherever the stage's direction bit is
    set — complementing every key stream exactly reverses the
    lexicographic order, so a plain ascending exchange there equals the
    descending exchange on the real values). This drops the per-layer
    ``^ desc`` everywhere and lets the keys-only form collapse to pure
    min/max with no comparison at all.

    tie_break: the roll branch below computes take-decisions at BOTH
    positions of a pair independently, which is only consistent when
    the comparator is antisymmetric on the pair — i.e. ties never
    happen (an idx stream), or ties are harmless because the comparator
    covers every stream (duplicating a fully-equal element is
    invisible). When the comparator ties on carried payload streams
    (num_keys < len(vals), e.g. unstable KV with a key-only
    comparator), set tie_break=True: ties keep both pair members in
    place (lt' = lt | (eq & partner-is-lower) before folding), which
    both members agree on, so payloads are never duplicated. The
    slice/kernel-D branches compute ONE swap mask per pair and are
    tie-consistent without it."""
    keys_only = len(vals) == 1
    if j >= _SLICE_MIN_J:
        # 3D leading-dim split only — Mosaic rejects the 4D form.
        d = 1 << (j - LOG_LANES)
        g = rows // (2 * d)
        vs = [v.reshape(g, 2 * d, LANES) for v in vals]
        a = [v[:, :d] for v in vs]
        b = [v[:, d:] for v in vs]
        if keys_only:
            na_nb = [[jnp.minimum(a[0], b[0])], [jnp.maximum(a[0], b[0])]]
        else:
            swap = _lex_lt(b, a, num_keys)
            na_nb = [[jnp.where(swap, b[t], a[t]) for t in range(len(vals))],
                     [jnp.where(swap, a[t], b[t]) for t in range(len(vals))]]
        return [jnp.concatenate([na, nb], axis=1).reshape(rows, LANES)
                for na, nb in zip(*na_nb)]
    if j >= LOG_LANES:
        d = 1 << (j - LOG_LANES)
        axis, size = 0, rows
    else:
        d = 1 << j
        axis, size = 1, LANES
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), axis)
    is_low = (iota & d) == 0
    if 2 * d == size:
        # Half-axis distance: i ^ d == (i + d) mod size for EVERY i, so
        # one cyclic roll IS the partner exchange — no second roll, no
        # partner select. (Lane axis only in practice: j == 6.)
        # NB np.int32 shifts: under jax x64 a bare Python int traces as
        # an i64 scalar and tpu.dynamic_rotate rejects it (64-bit-key
        # sorts run these kernels with x64 enabled).
        partner = [pltpu.roll(v, np.int32(d), axis) for v in vals]
        if keys_only:
            return [jnp.where(is_low, jnp.minimum(vals[0], partner[0]),
                              jnp.maximum(vals[0], partner[0]))]
    else:
        up = [pltpu.roll(v, np.int32(size - d), axis) for v in vals]
        dn = [pltpu.roll(v, np.int32(d), axis) for v in vals]
        if keys_only:
            # low takes min with its upper partner, high takes max with
            # its lower partner — no partner select, no comparison.
            return [jnp.where(is_low, jnp.minimum(vals[0], up[0]),
                              jnp.maximum(vals[0], dn[0]))]
        partner = [jnp.where(is_low, u, w) for u, w in zip(up, dn)]
    p_lt_v = _lex_lt(partner, vals, num_keys)
    if tie_break:
        # partner-is-lower-positioned == I am the high element
        p_eq_v = partner[0] == vals[0]
        for t in range(1, num_keys):
            p_eq_v = p_eq_v & (partner[t] == vals[t])
        p_lt_v = p_lt_v | (p_eq_v & ~is_low)
    take = p_lt_v == is_low
    return [jnp.where(take, p, v) for p, v in zip(partner, vals)]


def _tail_bits(rows: int) -> int:
    """log2(rows/128) when the v3 all-slice layout applies, else 0.

    v3 (row' = c*H + h) applies for H in {8, 16, 32}: measured at H = 4
    (3-stream KV at rows=512) the fused entry permute lowers much worse
    and the whole KV sort REGRESSED 244 -> 336 ms, while H = 8
    (keys-only rows=1024) improved 81.7 -> 75.9 ms, and the round-3b
    probes (scratch/r3b_tail2048.py / r3b_tail4096.py) measured the
    7-layer tail at H = 16: 0.83 vs 1.06 ms (v1) and H = 32: 0.92 vs
    0.86 — H = 32 ties v1 on the tail alone but its mid form wins and
    the whole chain measured faster (2.19 vs uncompilable subrolls).
    H = 64 (rows=8192, lb 20 blocks) is round-5's _BD_MAX=20
    experiment — only reachable when the compile probe admits lb 20.
    Smaller blocks use the v1 tile-transpose layout (row' = h*128 + c,
    tb = 0)."""
    h = rows // LANES
    return h.bit_length() - 1 if h in (8, 16, 32, 64) else 0


def _tail_enter(vals, rows: int):
    """Enter the tail layout (rows must be a multiple of 128).

    Element flat = h*16384 + r*128 + c (h = row>>7, r = row&127,
    c = lane) moves to VMEM position (c*H + h, r) with H = rows/128: a
    lane-axis exchange at flat distance 2^j becomes a ROW exchange at
    distance H*2^j — the zero-permute slice form once H*2^j >= 8, so at
    H = 8 (2^17 blocks) the ENTIRE j<=6 tail is slices. Lane rolls cost
    0.41 ms/layer at 2^27 (the dominant pool, 147 lane layers in the
    network); measured 7-layer tails at rows=1024: 2.87 ms as lane
    layers, 1.08 ms tile-transposed (v1), 0.73 ms in this layout.

    Entry is ONE fused transpose(2,0,1) (0.25 ms at 2^27); the fused
    inverse transpose(1,2,0) lowers element-serially in Mosaic (15.8
    ms — measured, scratch/r3_tailv2.py), so _tail_exit decomposes into
    a granule interleave swapaxes(0,1) (0.11 ms) + a [128,128] tile
    transpose (0.18 ms)."""
    h = rows // LANES
    if _tail_bits(rows) == 0:
        # v1: per-tile transpose, row' = h*128 + c (tb = 0)
        return [v.reshape(h, LANES, LANES).swapaxes(1, 2)
                .reshape(rows, LANES) for v in vals]
    return [v.reshape(h, LANES, LANES).transpose(2, 0, 1)
            .reshape(rows, LANES) for v in vals]


def _tail_exit(vals, rows: int):
    h = rows // LANES
    if _tail_bits(rows):
        vals = [v.reshape(LANES, h, LANES).swapaxes(0, 1)
                .reshape(rows, LANES) for v in vals]
    return [v.reshape(h, LANES, LANES).swapaxes(1, 2)
            .reshape(rows, LANES) for v in vals]


# A transposed j<=6 tail pays the layout permutes (~0.5 ms) to convert
# lane layers (0.41 ms each) into slice/sublane row forms; it wins from
# 4 tail layers up (stages s >= 4).
_T_TAIL_MIN = 4


def _mid_ok(rows: int) -> bool:
    """Mid-layout gate: j=7..9 sublane rolls become slices via a row-bit
    regroup row = (a,b,c) -> row' = (b,c,a), a = row>>7 — ONE
    swapaxes(0,1) row-granule interleave each way (0.12 ms at 2^27).
    flat bit j then sits at row' bit (j-7)+log2(H) => slice form.
    Measured at rows=1024: the j=9..7 triple drops 1.02 -> 0.37 ms
    including both permutes; rows=2048: 1.25 -> 0.49; rows=4096:
    0.54 (the plain subrolls do not even compile there — Mosaic
    internal error). Gated off at rows=512: the [4,128,128] interleave
    lowers ~2.5x worse and the dr=4 subroll survives — measured NET
    LOSS (0.92 -> 1.50)."""
    return rows // LANES in (8, 16, 32, 64)


def _mid_enter(vals, rows: int):
    a = rows // LANES
    return [v.reshape(a, LANES, LANES).swapaxes(0, 1).reshape(rows, LANES)
            for v in vals]


def _mid_exit(vals, rows: int):
    a = rows // LANES
    return [v.reshape(LANES, a, LANES).swapaxes(0, 1).reshape(rows, LANES)
            for v in vals]


def _run_mid(vals, top_j: int, num_keys: int, rows: int, tie_break: bool):
    """Layers j = top_j..7 (sublane-roll distances, top_j <= 9)."""
    if top_j < LOG_LANES:
        return vals
    if _mid_ok(rows):
        hb = (rows // LANES).bit_length() - 1
        vals = _mid_enter(vals, rows)
        for j in range(top_j, LOG_LANES - 1, -1):
            vals = _layer(vals, j + hb, num_keys, rows, tie_break)
        return _mid_exit(vals, rows)
    for j in range(top_j, LOG_LANES - 1, -1):
        vals = _layer(vals, j, num_keys, rows, tie_break)
    return vals


def _run_tail(vals, top_j: int, num_keys: int, rows: int,
              tie_break: bool):
    """Layers j = top_j..0 (all lane-axis, top_j <= 6): run in the tail
    layout when profitable, plain lane forms otherwise."""
    if top_j + 1 >= _T_TAIL_MIN and rows % LANES == 0:
        tb = _tail_bits(rows)
        vals = _tail_enter(vals, rows)
        for j in range(top_j, -1, -1):
            # row distance H*2^j == flat distance 2^(j+7+tb) here
            vals = _layer(vals, j + LOG_LANES + tb, num_keys, rows,
                          tie_break)
        return _tail_exit(vals, rows)
    for j in range(top_j, -1, -1):
        vals = _layer(vals, j, num_keys, rows, tie_break)
    return vals


def _kernel_a(*refs, log_block: int, num_streams: int, num_keys: int,
              tie_break: bool = False, row_log: int = 0,
              s_start: int = 1):
    """All stages s = s_start..log_block for one block; the global
    direction rule makes successive blocks come out alternately asc/desc.

    row_log > 0 = independent-row mode (``sort_rows``): stages stop at
    row_log and the final stage's direction is forced ascending, so
    every 2^row_log-aligned row sorts ascending on its own (exchanges
    at distance < 2^row_log never cross a row).

    s_start > 1 = continuation mode: the input already satisfies the
    network through stage s_start-1 (produced by a smaller-block
    kernel-A pass), and THIS block is 2^log_block >= 2^s_start, so
    stages s_start..log_block all run in-block in one HBM pass. This is
    what lets kernels B/D use a bigger block (lb_bd) than the
    VMEM-bound full kernel A (lb_a): the in-between stages cost ONE
    extra pass instead of (lb_bd - lb_a) kernel-D+B pass groups."""
    ins = refs[:num_streams]
    outs = refs[num_streams:]
    rows = 1 << (log_block - LOG_LANES)
    base = pl.program_id(0) * (1 << log_block)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    flat = row * LANES + lane
    top = min(log_block, row_log) if row_log else log_block
    vals = [r[...] for r in ins]
    # Direction folding: complement the key streams wherever this
    # stage's direction bit is set — the layers then run plain
    # ascending. The same mask also carries a constant sign-bit flip
    # (u32 order == i32 order on x ^ 0x80000000), because Mosaic only
    # legalizes SIGNED vector min/max — so the key streams live as
    # sign-flipped i32 inside the kernel. Between stages only the
    # CHANGED positions re-complement (one xor with fm ^ fm_prev; the
    # sign bit cancels, so it is applied once on entry, removed once
    # on exit).
    for t in range(num_keys):
        vals[t] = jax.lax.bitcast_convert_type(vals[t], jnp.int32)

    def fold(fm, fm_prev):
        for t in range(num_keys):
            vals[t] = vals[t] ^ (fm ^ fm_prev)
        return fm

    fm_prev = jnp.zeros((rows, LANES), jnp.int32)
    s0 = s_start
    region_top = min(top, LOG_LANES)
    if s_start == 1 and rows % LANES == 0 and region_top >= _T_TAIL_MIN:
        # Stages 1..7 consist ONLY of lane-axis layers (j <= 6): run the
        # whole prefix in transposed space — one transpose pair instead
        # of one per stage. The direction mask is a function of the flat
        # sort index, so it is computed from the transposed coordinates
        # here, and re-expressed in normal coordinates after the
        # transpose back (the fold travels with the element).
        tb = _tail_bits(rows)
        vals = _tail_enter(vals, rows)
        # position (row', lane') holds flat = h*16384 + lane'*128 + c,
        # where (h, c) = (row' & (H-1), row' >> tb) in the v3 layout and
        # (row' >> 7, row' & 127) in the v1 tile-transpose layout.
        if tb:
            h_idx, c_idx = row & ((1 << tb) - 1), row >> tb
        else:
            h_idx, c_idx = row >> LOG_LANES, row & (LANES - 1)
        flat_t = h_idx * (LANES * LANES) + lane * LANES + c_idx
        for s in range(1, region_top + 1):
            if s == row_log:
                fm = jnp.full((rows, LANES), _SIGN, jnp.int32)
            else:
                fm = (-((base + flat_t) >> s & 1)) ^ _SIGN
            fm_prev = fold(fm, fm_prev)
            for j in range(s - 1, -1, -1):
                vals = _layer(vals, j + LOG_LANES + tb, num_keys, rows,
                              tie_break)
        vals = _tail_exit(vals, rows)
        if region_top == row_log:
            fm_prev = jnp.full((rows, LANES), _SIGN, jnp.int32)
        else:
            fm_prev = (-((base + flat) >> region_top & 1)) ^ _SIGN
        s0 = region_top + 1
    for s in range(s0, top + 1):
        if s == row_log:      # final row stage: ascending everywhere
            fm = jnp.full((rows, LANES), _SIGN, jnp.int32)
        else:
            fm = (-((base + flat) >> s & 1)) ^ _SIGN
        fm_prev = fold(fm, fm_prev)
        for j in range(s - 1, 9, -1):
            vals = _layer(vals, j, num_keys, rows, tie_break)
        vals = _run_mid(vals, min(s - 1, 9), num_keys, rows, tie_break)
        vals = _run_tail(vals, min(s, LOG_LANES) - 1, num_keys, rows,
                         tie_break)
    for t in range(num_keys):
        vals[t] = jax.lax.bitcast_convert_type(vals[t] ^ fm_prev,
                                               jnp.uint32)
    for o, v in zip(outs, vals):
        o[...] = v


def _kernel_b(s_ref, *refs, log_block: int, num_streams: int,
              num_keys: int, tie_break: bool = False,
              force_asc: bool = False):
    """Stage s (traced scalar): in-block layers j = log_block-1 .. 0.

    force_asc: final stage of independent-row mode — direction is
    ascending everywhere regardless of s (see _kernel_a row_log)."""
    ins = refs[:num_streams]
    outs = refs[num_streams:]
    rows = 1 << (log_block - LOG_LANES)
    s = s_ref[0]
    base = pl.program_id(0) * (1 << log_block)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    flat = row * LANES + lane
    # s > log_block always, so the direction bit is constant across the
    # block; fold it once (complement + sign flip at entry/exit) — see
    # _kernel_a.
    if force_asc:
        fm = jnp.full((rows, LANES), _SIGN, jnp.int32)
    else:
        fm = (-((base + flat) >> s & 1)) ^ _SIGN
    vals = [r[...] for r in ins]
    for t in range(num_keys):
        vals[t] = jax.lax.bitcast_convert_type(vals[t], jnp.int32) ^ fm
    for j in range(log_block - 1, 9, -1):
        vals = _layer(vals, j, num_keys, rows, tie_break)
    vals = _run_mid(vals, min(log_block - 1, 9), num_keys, rows, tie_break)
    vals = _run_tail(vals, min(log_block, LOG_LANES) - 1, num_keys, rows,
                     tie_break)
    for t in range(num_keys):
        vals[t] = jax.lax.bitcast_convert_type(vals[t] ^ fm, jnp.uint32)
    for o, v in zip(outs, vals):
        o[...] = v


def _kernel_d(*refs, n_blocks: int, num_streams: int, num_keys: int,
              s: int, j_lo: int, chunk_rows: int, span_rows: int,
              group_rows: int, chunks_per_span: int, n_groups: int,
              force_asc: bool = False):
    """Layers j = j_hi..j_lo (all >= log_block): n_blocks =
    2^(j_hi-j_lo+1) interacting sub-blocks, manually DMA'd (a BlockSpec
    cannot write several disjoint blocks of one output), pure min/max
    between block pairs — no rolls at this granularity. Direction =
    bit s of the group base, a scalar per grid step.

    Double-buffered across grid steps (slot = step % 2): the next
    step's loads are issued while this step computes, hiding DMA
    latency behind the exchange (measured: the serial form ran
    ~0.8 ms/pass above the HBM floor)."""
    ins = refs[:num_streams]
    outs = refs[num_streams:2 * num_streams]
    scratch = refs[2 * num_streams:3 * num_streams]
    lsem = refs[3 * num_streams]
    ssem = refs[3 * num_streams + 1]
    g = pl.program_id(0)
    c = pl.program_id(1)
    step = g * chunks_per_span + c
    total = n_groups * chunks_per_span
    # NB jnp.int32 literal: under jax x64 mode a bare `2` would promote
    # to i64 and lax.rem rejects the mixed dtypes (64-bit-key sorts run
    # this kernel with x64 enabled).
    slot = jax.lax.rem(step, jnp.int32(2))
    nslot = jnp.int32(1) - slot
    if force_asc:
        desc = jnp.bool_(False)        # final independent-row stage
    else:
        desc = (((g * group_rows * LANES) >> s) & 1) == 1   # scalar bool

    # One DMA semaphore per (slot, stream) SHARED by all blocks (a
    # per-block sem array exhausts the core's sflag registers at
    # 2 slots x 64 blocks x 3 streams); counts are fungible — each
    # wait() drains one issued copy's amount, and a slot's sem is fully
    # drained before the slot is reused.
    def loads(sl, gg, cc):
        out = []
        for t in range(num_streams):
            for p in range(n_blocks):
                r0 = gg * group_rows + p * span_rows + cc * chunk_rows
                out.append(pltpu.make_async_copy(
                    ins[t].at[pl.ds(r0, chunk_rows), :],
                    scratch[t].at[sl, np.int32(p)], lsem.at[sl, np.int32(t)]))
        return out

    def stores(sl, gg, cc):
        out = []
        for t in range(num_streams):
            for p in range(n_blocks):
                r0 = gg * group_rows + p * span_rows + cc * chunk_rows
                out.append(pltpu.make_async_copy(
                    scratch[t].at[sl, np.int32(p)],
                    outs[t].at[pl.ds(r0, chunk_rows), :],
                    ssem.at[sl, np.int32(t)]))
        return out

    @pl.when(step == 0)
    def _():
        for dma in loads(slot, g, c):
            dma.start()

    # NB explicit jnp.int32 scalars: under jax x64 the weak-typed
    # literals promote through a convert that Mosaic's lowering helper
    # re-emits recursively (infinite _convert_helper/astype loop,
    # found by the large-n 64-bit-value path — kernel D only runs at
    # n > 2^17, which no x64 test reached before round 5).
    wrap = c + jnp.int32(1) == chunks_per_span
    ng = jnp.where(wrap, g + jnp.int32(1), g)
    nc = jnp.where(wrap, jnp.int32(0), c + jnp.int32(1))

    @pl.when(step + 1 < total)
    def _():
        # the next slot's previous stores (issued one step ago) must
        # land before its scratch is refilled
        @pl.when(step >= 1)
        def _():
            for dma in stores(nslot, g, c):
                dma.wait()
        for dma in loads(nslot, ng, nc):
            dma.start()

    for dma in loads(slot, g, c):
        dma.wait()

    vals = [[scratch[t][slot, np.int32(p)] for p in range(n_blocks)]
            for t in range(num_streams)]
    n_layers = (n_blocks - 1).bit_length()
    for ell in range(n_layers - 1, -1, -1):     # j = j_lo+ell, descending
        bit = 1 << ell
        for p in range(n_blocks):
            if p & bit:
                continue
            q = p | bit
            a = [vals[t][p] for t in range(num_streams)]
            b = [vals[t][q] for t in range(num_streams)]
            b_lt_a = _lex_lt(b, a, num_keys)
            swap = b_lt_a ^ desc
            for t in range(num_streams):
                na = jnp.where(swap, b[t], a[t])
                nb = jnp.where(swap, a[t], b[t])
                vals[t][p] = na
                vals[t][q] = nb

    for t in range(num_streams):
        for p in range(n_blocks):
            scratch[t][slot, np.int32(p)] = vals[t][p]
    for dma in stores(slot, g, c):
        dma.start()

    @pl.when(step + 1 == total)
    def _():
        for dma in stores(slot, g, c):
            dma.wait()

        @pl.when(step >= 1)
        def _():
            for dma in stores(nslot, g, c):
                dma.wait()


def _pallas_blocks(kernel, streams, log_block: int, num_keys: int,
                   interpret: bool, scalar=None, tie_break: bool = False,
                   **kernel_kw):
    num_streams = len(streams)
    rows_total = streams[0].shape[0] * streams[0].shape[1] // LANES
    block_rows = 1 << (log_block - LOG_LANES)
    grid = rows_total // block_rows
    spec = pl.BlockSpec((block_rows, LANES), lambda i, *_: (i, np.int32(0)),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(kernel, log_block=log_block,
                             num_streams=num_streams, num_keys=num_keys,
                             tie_break=tie_break, **kernel_kw)
    shapes = [jax.ShapeDtypeStruct((rows_total, LANES), jnp.uint32)
              ] * num_streams
    label = f"bitonic.{kernel.__name__.lstrip('_')}[lb{log_block}]"
    if scalar is None:
        out = profile_call(
            label,
            pl.pallas_call(
                kern, grid=(grid,),
                in_specs=[spec] * num_streams,
                out_specs=[spec] * num_streams,
                out_shape=shapes, interpret=interpret),
            *streams, _level="kernel")
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(grid,),
            in_specs=[spec] * num_streams,
            out_specs=[spec] * num_streams)
        out = profile_call(
            label,
            pl.pallas_call(
                kern, grid_spec=grid_spec,
                out_shape=shapes, interpret=interpret),
            scalar, *streams, _level="kernel")
    return list(out)


def _run_kernel_d(streams, s: int, j_hi: int, j_lo: int, log_n: int,
                  num_keys: int, interpret: bool,
                  force_asc: bool = False):
    """streams: [(rows,128)]; run layers j_hi..j_lo of stage s."""
    num_streams = len(streams)
    n_blocks = 1 << (j_hi - j_lo + 1)
    rows_total = streams[0].shape[0]
    # chunk the contiguous 2^j_lo span so the n_blocks scratch chunks fit
    # VMEM: total scratch = 2 slots * streams * n_blocks * chunk_rows
    # * 512B <= 8MB of the ~16MB scoped limit (the slot dim doubles the
    # budget_rows figure below — size chunk_rows against 8MB, not 4).
    # chunk_rows MUST be a power of two: it has to divide span_rows
    # exactly and stay 8-row DMA-aligned (85-row chunks once left rows
    # 85..127 of every span untouched — measured corruption).
    budget_rows = (1 << 20) // LANES // max(1, num_streams)  # 1M elems
    span_rows = 1 << (j_lo - LOG_LANES)          # one block's full rows
    chunk_rows = min(span_rows,
                     1 << max(3, (budget_rows // n_blocks).bit_length() - 1))
    group_rows = 1 << (j_hi + 1 - LOG_LANES)     # rows per pair-group
    n_groups = rows_total // group_rows
    chunks_per_span = span_rows // chunk_rows

    kern = functools.partial(
        _kernel_d, n_blocks=n_blocks, num_streams=num_streams,
        num_keys=num_keys, s=s, j_lo=j_lo, chunk_rows=chunk_rows,
        span_rows=span_rows, group_rows=group_rows,
        chunks_per_span=chunks_per_span, n_groups=n_groups,
        force_asc=force_asc)
    shapes = [jax.ShapeDtypeStruct((rows_total, LANES), jnp.uint32)
              ] * num_streams
    out = profile_call(
        f"bitonic.kernel_d[s{s} j{j_hi}..{j_lo}]",
        pl.pallas_call(
            kern, grid=(n_groups, chunks_per_span),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * num_streams,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * num_streams,
            out_shape=shapes,
            scratch_shapes=(
                [pltpu.VMEM((2, n_blocks, chunk_rows, LANES), jnp.uint32)
                 ] * num_streams
                + [pltpu.SemaphoreType.DMA((2, num_streams))] * 2),
            interpret=interpret),
        *streams, _level="kernel")
    return list(out)


# Compile-probe verdict cache: (kind, ns, num_keys, lb, tie_break) ->
# bool. Populated lazily by _probe_geometry on the TPU backend; an
# entry can be pre-set by tests to force either verdict.
_GEOM_OK: dict = {}


def _probe_geometry(kind: str, ns: int, num_keys: int, lb: int,
                    tie_break: bool = False, s_start: int = 1) -> bool:
    """One-time compile probe: does this kernel geometry fit the
    backend's scoped-VMEM budget?

    Round-4 VERDICT weak #6: the old 6 MB pipeline-product cap was a
    point-sample heuristic — per-stream chain temporaries scale
    superlinearly with stream count (ns=1 @ lb 19 [8 MB product]
    compiles while ns=2 @ lb 18 [same product] died with `scoped vmem
    22.34M > 16M` after a stack bump), so only the compiler itself can
    answer admissibility. This compiles ONE grid-step of the candidate
    kernel (kind "b" = stage-tail chain, "cont" = kernel-A continuation
    chain stages s_start..lb, "a" = full kernel-A block chain) and
    caches the verdict in-process; Mosaic rejections (or any compile
    failure) record False and the caller falls back a level — a
    compiler-stack change can cost a probe, never a crash. The probed
    executable is the same shape the real pass compiles, so the JAX/
    server compile cache makes a successful probe's cost part of the
    real compile, not extra."""
    key = (kind, ns, num_keys, lb, tie_break, s_start)
    if key in _GEOM_OK:
        return _GEOM_OK[key]
    try:
        rows = 1 << (lb - LOG_LANES)
        shapes = [jax.ShapeDtypeStruct((rows, LANES), jnp.uint32)] * ns
        if kind == "b":
            def fn(*streams):
                return _pallas_blocks(
                    _kernel_b, list(streams), lb, num_keys, False,
                    scalar=jnp.full((1,), lb + 1, jnp.int32),
                    tie_break=tie_break)
        elif kind == "cont":
            def fn(*streams):
                return _pallas_blocks(
                    _kernel_a, list(streams), lb, num_keys, False,
                    tie_break=tie_break, row_log=0, s_start=s_start)
        else:                                    # "a": full block chain
            def fn(*streams):
                return _pallas_blocks(
                    _kernel_a, list(streams), lb, num_keys, False,
                    tie_break=tie_break, row_log=0)
        # Single attempt, no retry: on this stack a deterministic
        # scoped-vmem rejection and a transient service hiccup are
        # indistinguishable (both surface as remote-compile HTTP 500),
        # and a retry would double a 5-15 min failed compile on the
        # COMMON case. A transient false-negative only costs a level
        # of block-size fallback for the process lifetime.
        jax.jit(fn).lower(*shapes).compile()
        ok = True
    except Exception as e:                       # Mosaic scoped-vmem etc.
        import logging

        logging.getLogger("sortx").info(
            "bitonic geometry probe %s rejected: %s",
            key, str(e)[:200])
        ok = False
    _GEOM_OK[key] = ok
    return ok


def _probing_backend() -> bool:
    """Probes only make sense where Mosaic compiles for real silicon."""
    return jax.default_backend() == "tpu"


# Largest lb_bd any path may escalate to. 19 is the measured-best
# silicon point (lb_bd 19 = 61.5 ms vs 18 = 64.0 at 2^27 keys-only);
# 20 (H=64 layouts, 3-stage continuation chain) is the round-5
# experiment knob — raise only behind a measured win.
_BD_MAX = 19


def _bd_block(lb: int, ns: int, top: int, *, interpret: bool = False,
              num_keys: int = 1, tie_break: bool = False,
              need_cont: bool = True) -> int:
    """Block size (log2) for kernels B/D — may exceed kernel A's.

    Kernel A's block is capped by its unrolled-chain VMEM stack (2^17
    keys-only), but kernels B and D only hold ONE stage's chain, so they
    can afford a bigger block: each +1 removes ~2 kernel-D passes and
    one whole B+D stage group (its stages run inside the kernel-A
    continuation pass instead). Gates: the good tail/mid layouts exist
    for rows in {1024, ..., 8192} (lb 17.._BD_MAX, see _tail_bits);
    admissibility of a candidate is decided by a one-time COMPILE PROBE
    on the TPU backend (_probe_geometry — both the stage-tail kernel B
    and the continuation chain must fit), with the silicon-proven
    static rule as the non-TPU/interpret fallback: ns=1 up to an 8 MB
    in+out pipeline product, multi-stream up to 6 MB (ns=3 @ 17, the
    stable-KV path). Measured at 2^27 u32 (keys-only, lb 17): lb_bd
    19 = 61.5 ms vs 18 = 64.0 vs 17 (disabled) = 72.1."""
    def static_ok(cand: int) -> bool:
        return (ns == 1 and (16 << cand) <= (8 << 20)) or \
            ns * (16 << cand) <= (6 << 20)

    probing = not interpret and _probing_backend()

    def admissible(cand: int) -> bool:
        if not probing:
            return static_ok(cand)
        # Probe even statically-admissible points: a compiler bump
        # that shrinks the budget falls back instead of failing at the
        # real compile (round-3's silent break). The continuation
        # chain only matters for full sorts — a lone merge stage
        # (bitonic_merge_streams) never runs one.
        if not _probe_geometry("b", ns, num_keys, cand, tie_break):
            return False
        return (not need_cont) or _probe_geometry(
            "cont", ns, num_keys, cand, tie_break, s_start=lb + 1)

    # Escalation is capped at lb+2 (continuation depth 2, the measured
    # ceiling) on the static rule; the probe may additionally check
    # lb+3 (the _BD_MAX=20 experiment slot) since it compiles the
    # actual continuation chain.
    hi = min(top, _BD_MAX, lb + (3 if probing else 2))
    for cand in range(hi, lb, -1):
        if not 17 <= cand <= _BD_MAX:
            continue
        if admissible(cand):
            return cand
    return lb


def bitonic_merge_streams(streams, num_keys: int, *,
                          interpret: bool = False,
                          log_block: int = LOG_BLOCK,
                          tie_break: bool = False):
    """Run ONE ascending bitonic-merge stage over ``streams``.

    Precondition: the streams already form a single BITONIC sequence on
    the first ``num_keys`` streams (ascending run followed by a
    descending run — e.g. ``concat(sorted_a, pad, reverse(sorted_b))``).
    This is exactly the final stage (s = log n) of the full network:
    log n layers instead of the full sort's log^2 n/2, so merging two
    sorted arrays costs ~7% of re-sorting at 2^27. Length must be a
    power of two >= 1024.
    """
    n = streams[0].shape[0]
    log_n = n.bit_length() - 1
    if (1 << log_n) != n:
        raise ValueError("bitonic_merge_streams needs power-of-two length")
    if n < 1024:
        raise ValueError("bitonic_merge_streams needs n >= 1024")
    ns = len(streams)
    lb = min(log_block - max(0, ns.bit_length() - 1), log_n)
    lb = _bd_block(lb, ns, log_n, interpret=interpret,   # one stage:
                   num_keys=num_keys, tie_break=tie_break,  # B/D only
                   need_cont=False)
    x = [v.reshape(-1, LANES) for v in streams]
    s = log_n                     # direction bit (i >> s) is 0 everywhere
    j = s - 1
    while j >= lb:                # cross-block layers: kernel D passes
        j_lo = max(lb, j - _d_fuse(ns) + 1)
        x = _run_kernel_d(x, s, j, j_lo, log_n, num_keys, interpret)
        j = j_lo - 1
    x = _pallas_blocks(_kernel_b, x, lb, num_keys, interpret,
                       scalar=jnp.full((1,), s, jnp.int32),
                       tie_break=tie_break)
    return tuple(v.reshape(-1) for v in x)


def bitonic_sort_streams(streams, num_keys: int, *, interpret: bool = False,
                         log_block: int = LOG_BLOCK, tie_break: bool = False,
                         n_valid: int | None = None,
                         row_log: int | None = None):
    """Sort parallel u32 ``streams`` by the first ``num_keys`` streams
    (lexicographic), full bitonic network. len must be a power of two.

    Returns the streams reordered. Cost is data-independent.

    ``n_valid``: number of real elements — everything at index >=
    n_valid must be 0xffffffff in EVERY stream (the callers pad that
    way). The network then prunes pad-only work: at stage s only the
    groups intersecting [0, ceil(n_valid/2^s)*2^s) are processed — a
    group with no real element is all-0xffffffff and sorts to itself
    (exchanges never move a real element out of its stage group, and a
    descending group parks reals at its own tail), so the working
    arrays just carry a growing covered prefix and re-pad between
    stages. Worst case (n_valid = 2^k + 1) this halves the network
    instead of doubling it.

    ``row_log``: independent-row mode (``sort_rows``): the flat array
    is B rows of 2^row_log elements, each sorted ascending on its own.
    Exchanges at distance < 2^row_log never cross a row-aligned
    boundary, so the only changes are (a) stages stop at row_log and
    (b) the final stage's direction is forced ascending. Total length
    then only needs to be a multiple of the block (not a power of
    two); row counts are free.
    """
    n = streams[0].shape[0]
    nv = n if n_valid is None else min(n_valid, n)
    # VMEM budget: in+out blocks x pipeline double-buffering per stream
    # must fit the ~16MB scoped limit — shrink the block as streams grow
    # (relative to the caller's log_block so it stays tunable).
    # Measured at 2^27, 3 streams: eff. lb 15 = 440ms vs 14 = 479ms
    # vs 16 = 452ms (fits but loses) — so ns in {2,3} drops one level,
    # ns in {4..7} two.
    ns = len(streams)
    if row_log is None:
        log_n = n.bit_length() - 1
        if (1 << log_n) != n:
            raise ValueError("bitonic_sort_streams needs power-of-two "
                             "length")
        lb = min(log_block - max(0, ns.bit_length() - 1), log_n)
        top = log_n
    else:
        # rows pack into blocks freely (kernel A stops at row_log); the
        # block just has to divide the total length.
        tz = (n & -n).bit_length() - 1
        lb = min(log_block - max(0, ns.bit_length() - 1), tz)
        if lb < 10:
            raise ValueError("rows-mode length must be a multiple of "
                             "1024")
        log_n = max(lb, row_log)  # only used by _run_kernel_d's signature
        top = row_log
    ext = min(n, -(-nv >> lb) << lb)
    x = [s[:ext].reshape(-1, LANES) for s in streams]
    x = _pallas_blocks(_kernel_a, x, lb, num_keys, interpret,
                       tie_break=tie_break, row_log=row_log or 0)
    lb_bd = lb if row_log is not None else _bd_block(
        lb, ns, top, interpret=interpret, num_keys=num_keys,
        tie_break=tie_break)
    if lb_bd > lb:
        # Continuation pass: stages lb+1..lb_bd in ONE bigger-block
        # kernel-A pass (see _kernel_a s_start); kernels B/D then run at
        # lb_bd — fewer D passes and a cheaper per-stage chain (the
        # rows=2048/4096 tail+mid layouts, _tail_bits/_mid_ok).
        new_ext = min(n, -(-nv >> lb_bd) << lb_bd)
        if new_ext > ext:
            pad_rows = (new_ext - ext) // LANES
            x = [jnp.pad(v, ((0, pad_rows), (0, 0)),
                         constant_values=np.uint32(0xFFFFFFFF)) for v in x]
            ext = new_ext
        x = _pallas_blocks(_kernel_a, x, lb_bd, num_keys, interpret,
                           tie_break=tie_break, row_log=0,
                           s_start=lb + 1)
    for s in range(lb_bd + 1, top + 1):
        new_ext = min(n, -(-nv >> s) << s)
        if new_ext > ext:
            pad_rows = (new_ext - ext) // LANES
            x = [jnp.pad(v, ((0, pad_rows), (0, 0)),
                         constant_values=np.uint32(0xFFFFFFFF)) for v in x]
            ext = new_ext
        force = row_log is not None and s == row_log
        j = s - 1
        while j >= lb_bd:                  # kernel D passes, fused
            j_lo = max(lb_bd, j - _d_fuse(ns) + 1)
            x = _run_kernel_d(x, s, j, j_lo, log_n, num_keys, interpret,
                              force_asc=force)
            j = j_lo - 1
        x = _pallas_blocks(_kernel_b, x, lb_bd, num_keys, interpret,
                           scalar=jnp.full((1,), s, jnp.int32),
                           tie_break=tie_break, force_asc=force)
    return tuple(v.reshape(-1) for v in x)
