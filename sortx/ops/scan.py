"""Exclusive prefix scan — the keystone primitive.

TPU-native replacement for the reference's 3-kernel scan pipeline
(``Pprims::scan``, ``Tahoe/ParallelPrimitives/Pprims.cpp:122-179``;
kernels in ``Tahoe/ClKernels/PrefixScanKernels.cl``).

Design (deliberately NOT a translation):
  The reference runs LocalScanKernel -> TopLevelScanKernel -> AddOffsetKernel,
  and its single-work-group top level caps n at 4096*256 = 2^20 elements
  (the known Demo.Scan failure, ``Pprims.cpp:134-138``). On TPU, a Pallas
  grid executes its steps *sequentially* on one core with scratch that
  persists across steps — so the whole scan is ONE kernel: each grid step
  scans its tile in VMEM (log-step Hillis-Steele over the 8x128 lane
  geometry) and threads a running carry through SMEM. One read + one write
  per element (the reference needs three passes), and no size cap: the 2^20
  failure case passes by construction.

Semantics: exclusive prefix sum with 32-bit wraparound, identical to the
reference oracle (``UnitTest/main.cpp:193-199``); optional grand total
(``Pprims.h:35`` ``sum`` argument).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config, default_config
from ..runtime.launcher import profiled
from ..utils.math import cdiv

__all__ = ["scan", "cumsum_lanes", "cumsum_sublanes"]

_LANES = 128


def cumsum_lanes(x, *, exclusive: bool = False):
    """In-kernel inclusive/exclusive cumsum along the lane (last) axis.

    Log-step Hillis-Steele via circular rolls + lane masks: the TPU-geometry
    equivalent of the reference's LDS ``ScanExclusive``
    (``PrefixScanKernels.cl:26-67``). Mosaic has no native cumsum.
    """
    n = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    orig = x
    s = 1
    while s < n:
        x = jnp.where(lane >= s,
                      x + pltpu.roll(x, np.int32(s), len(x.shape) - 1), x)
        s *= 2
    return x - orig if exclusive else x


def cumsum_sublanes(x, *, exclusive: bool = False):
    """In-kernel cumsum along the sublane (second-to-last) axis."""
    n = x.shape[-2]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 2)
    orig = x
    s = 1
    while s < n:
        x = jnp.where(row >= s,
                      x + pltpu.roll(x, np.int32(s), len(x.shape) - 2), x)
        s *= 2
    return x - orig if exclusive else x


def _cumsum_lanes_mxu(x):
    """Exact inclusive lane-cumsum of int32 via four bf16 triangular matmuls.

    Split into byte planes: bytes (<=255) are exact in bf16, and the f32
    accumulation of <=128 of them stays below 2^15 — bit-exact on the MXU
    with DEFAULT precision (the TPU lowers f32 matmuls to bf16 passes, so
    16-bit halves are NOT safe — measured). Recombined with wrapping int32
    shifts. Offloads the scan's hot loop from the VPU roll chain.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    upper = (row <= col).astype(jnp.bfloat16)
    out = None
    for b in range(4):
        plane = (jax.lax.shift_right_logical(x, 8 * b) & 0xFF).astype(
            jnp.bfloat16)
        incl = jnp.dot(plane, upper,
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        term = incl << (8 * b)
        out = term if out is None else out + term
    return out


def _scan_tile_kernel(x_ref, o_ref, total_ref, carry_ref, *,
                      use_mxu: bool = False):
    """One grid step: exclusive-scan an (R,128) tile, thread carry in SMEM.

    The cross-row carry runs on row-sums COMPACTED to (R/128, 128): a
    (R,1)-shaped scan would burn a full 8x128 vreg per value (measured 3x
    slowdown of the whole kernel), so the per-row totals are reshaped
    dense before their own log-step scan.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[0] = 0

    x = x_ref[...]
    rows = x.shape[0]
    incl = _cumsum_lanes_mxu(x) if use_mxu else cumsum_lanes(x)
    row_sums = incl[:, _LANES - 1:_LANES]            # (R,1) per-row totals
    if rows % _LANES == 0 and rows > _LANES:
        # Compact to (R/128, 128) row-major, scan there (dense vregs),
        # then apply per 128-row group. Mosaic cannot reshape back to
        # (R,1), so the offsets come out via one small transpose + slices.
        groups = rows // _LANES
        rs2 = row_sums.reshape(groups, _LANES)
        i2 = cumsum_lanes(rs2)
        gsum = i2[:, _LANES - 1:_LANES]              # (G,1) group totals
        goff = cumsum_sublanes(gsum) - gsum
        excl2 = i2 - rs2 + goff                      # (G,128) row offsets
        excl2t = excl2.T                             # (128,G)
        base = incl - x + carry_ref[0]
        parts = []
        for g in range(groups):
            parts.append(base[g * _LANES:(g + 1) * _LANES, :]
                         + excl2t[:, g:g + 1])
        o_ref[...] = jnp.concatenate(parts, axis=0)
        tile_total = jnp.sum(gsum)
    else:
        row_off = cumsum_sublanes(row_sums) - row_sums
        o_ref[...] = incl - x + row_off + carry_ref[0]
        tile_total = jnp.sum(row_sums[rows - 1:rows, :]) + jnp.sum(
            row_off[rows - 1:rows, :])
    carry_ref[0] = carry_ref[0] + tile_total

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        total_ref[0] = carry_ref[0]


@functools.partial(jax.jit, static_argnames=("tile_elems", "interpret",
                                              "use_mxu"))
def _scan_padded(x2d, tile_elems: int, interpret: bool,
                 use_mxu: bool = False):
    total_rows = x2d.shape[0]
    tile_rows = tile_elems // _LANES
    grid = total_rows // tile_rows
    out, total = pl.pallas_call(
        functools.partial(_scan_tile_kernel, use_mxu=use_mxu),
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile_rows, _LANES), lambda i: (i, np.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((tile_rows, _LANES), lambda i: (i, np.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((total_rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(x2d)
    return out, total


@profiled("scan")
def scan(x, *, with_total: bool = False, inclusive: bool = False,
         config: Config | None = None):
    """Prefix sum of a 1D 32-bit array (exclusive by default).

    Args:
      x: 1D int32/uint32 array (any length; no 2^20 cap, unlike the
        reference's ``Pprims.cpp:134-138``).
      with_total: also return the grand total (``Pprims::scan`` sumOut).
      inclusive: inclusive instead of exclusive scan (beyond-reference).
      config: engine configuration; defaults to the global config.

    Returns:
      Scanned array of x.dtype, and the total if requested. Arithmetic
      wraps mod 2^32, bit-identical to the reference's u32 semantics.
    """
    cfg = config or default_config()
    if x.ndim != 1:
        raise ValueError("scan expects a 1D array")
    n = x.shape[0]
    dtype = x.dtype
    if dtype not in (jnp.int32, jnp.uint32):
        raise TypeError(f"scan supports 32-bit integer arrays, got {dtype}")
    if n == 0:
        total = jnp.zeros((), dtype)
        return (x, total) if with_total else x

    engine = cfg.engine
    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "host"

    if engine == "host":
        xi = x.astype(jnp.uint32) if dtype == jnp.int32 else x
        incl = jnp.cumsum(xi)  # u32 wraps identically
        out = (incl if inclusive else (incl - xi)).astype(dtype)
        if with_total:
            return out, incl[-1].astype(dtype)
        return out

    xi = x.view(jnp.int32) if dtype == jnp.uint32 else x
    tile_elems = cfg.scan_tile_elems
    padded = cdiv(n, tile_elems) * tile_elems
    if padded != n:
        xi = jnp.pad(xi, (0, padded - n))
    x2d = xi.reshape(padded // _LANES, _LANES)
    out2d, total = _scan_padded(x2d, tile_elems, cfg.interpret,
                                cfg.scan_use_mxu)
    out = out2d.reshape(-1)[:n]
    if inclusive:
        out = out + xi[:n]
    if dtype == jnp.uint32:
        out = out.view(jnp.uint32)
    if with_total:
        # Padded tail is zeros, so the final carry IS the grand total.
        t = total[0]
        return out, (t.view(jnp.uint32) if dtype == jnp.uint32 else t)
    return out
