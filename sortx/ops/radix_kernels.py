"""Pallas TPU kernels for the radix sort engine.

TPU-native re-design of the reference's kernel set
(``Tahoe/ClKernels/RadixSort32Kernels.cl``): the reference's
StreamCount/PrefixScan/SortAndScatter trio maps here to
histogram / scan (sortx.ops.scan) / tile-sort + DMA-shuffle — but the
internals share nothing with the wavefront-64 LDS design; they are built
on the 8x128 lane geometry: lane-wise one-hot reductions for histograms,
in-register bitonic networks over lanes for row sorting, and
grid-sequential DMA with monotone over-copy for the scatter.
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

__all__ = ["tile_histogram", "bitonic_rowsort_comp", "row_sort", "LANES"]


def bitonic_rowsort_comp(comp):
    """Sort each 128-lane row of ``comp`` ascending, in registers.

    A Batcher bitonic network over the lane axis: compare-exchange partners
    are reached with circular lane rolls (no scatter on this ISA). 28
    layers for 128 lanes. The reference's equivalent is the LDS-based
    ``sort4Bits1`` rank-and-exchange (``RadixSort32Kernels.cl:401-489``);
    on TPU a network is cheaper than ranking because in-register rolls are
    single VPU ops and there is no LDS to exchange through.
    """
    shape = comp.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    nstage = 7
    for k in range(1, nstage + 1):
        for j in range(k - 1, -1, -1):
            d = 1 << j
            up = pltpu.roll(comp, np.int32(LANES - d), len(shape) - 1)
            dn = pltpu.roll(comp, np.int32(d), len(shape) - 1)
            partner = jnp.where(((lane >> j) & 1) == 0, up, dn)
            if k < nstage:
                asc = ((lane >> k) & 1) == 0
            else:
                asc = jnp.ones(shape, dtype=jnp.bool_)
            is_low = ((lane >> j) & 1) == 0
            take_min = asc == is_low
            comp = jnp.where(take_min, jnp.minimum(comp, partner),
                             jnp.maximum(comp, partner))
    return comp


def row_sort(x, digit, values=None):
    """Stable in-register sort of each row by ``digit``.

    Sorts the (digit*128 + lane) composite (unique keys -> the lane
    tiebreak makes it stable), then gathers key/value rows through the
    sorted composite's low bits. Returns (keys, values, digits) row-sorted.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    comp = digit * LANES + lane
    scomp = bitonic_rowsort_comp(comp)
    src = scomp & (LANES - 1)
    ks = jnp.take_along_axis(x, src, axis=x.ndim - 1)
    vs = (jnp.take_along_axis(values, src, axis=x.ndim - 1)
          if values is not None else None)
    ds = scomp >> 7
    return ks, vs, ds


def _histogram_kernel(shift_ref, x_ref, counts_ref, *, radix: int):
    """Per-tile digit histogram.

    StreamCountKernel analog (``RadixSort32Kernels.cl:176-236``) — but
    instead of per-work-item LDS counter rows, counts come from lane-wise
    one-hot reductions (one vectorized compare+reduce per bucket).
    Output row t = counts of tile t, bucket-minor: counts[t, d].
    """
    shift = shift_ref[0]
    x = x_ref[...]
    d = jax.lax.shift_right_logical(
        x, jnp.uint32(shift)).astype(jnp.int32) & (radix - 1)
    cols = []
    for b in range(radix):
        cols.append(jnp.sum((d == b).astype(jnp.int32), keepdims=True))
    # Output block is (8, width): TPU block shapes need 8-divisible rows.
    # Counts land in row 0; rows 1..7 are zero padding (sliced off by the
    # caller). Built with concatenation — .at[].set on a value is a
    # scatter, which Mosaic has no lowering for.
    width = max(radix, LANES)
    row = jnp.concatenate(cols, axis=0).reshape(1, radix)
    if radix < width:
        row = jnp.concatenate(
            [row, jnp.zeros((1, width - radix), jnp.int32)], axis=1)
    block = jnp.concatenate(
        [row, jnp.zeros((7, width), jnp.int32)], axis=0)
    counts_ref[...] = block


@functools.partial(jax.jit,
                   static_argnames=("radix", "tile_rows", "interpret"))
def tile_histogram(x2d, shift, *, radix: int = 16, tile_rows: int = 256,
                   interpret: bool = False):
    """Histogram of ``(x >> shift) & (radix-1)`` per tile.

    Args:
      x2d: (rows, 128) uint32 view of the key array (rows % tile_rows == 0).
      shift: scalar int32 bit offset.

    Returns:
      (num_tiles, 128) int32; columns [0, radix) hold the counts.
    """
    rows = x2d.shape[0]
    grid = rows // tile_rows
    width = max(radix, LANES)
    out = pl.pallas_call(
        functools.partial(_histogram_kernel, radix=radix),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, np.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, width), lambda i: (i, np.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * 8, width), jnp.int32),
        interpret=interpret,
    )(jnp.atleast_1d(shift).astype(jnp.int32), x2d)
    return out[::8]
