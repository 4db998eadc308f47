"""Beyond-reference convenience primitives built on the core sort.

The reference exposes only scan/sort/sort_kv; these are the standard
companions users expect from a sort library, built stably on the same
engines (so they inherit every engine's correctness guarantees).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from .sort import sort_kv
from .sort_xla import sort_multi_xla

__all__ = ["argsort", "sort_u64", "sort_kv_u64"]


def argsort(keys, sort_bits: int = 32, *, config: Config | None = None):
    """Stable argsort: the permutation that sorts ``keys``.

    Equivalent to numpy's ``argsort(kind='stable')`` for u32/i32/f32 keys.
    """
    idx = jnp.arange(keys.shape[0], dtype=jnp.uint32)
    _, perm = sort_kv(keys, idx, sort_bits, config=config)
    return perm.astype(jnp.int32)


def sort_u64(hi, lo, *, config: Config | None = None):
    """Stable sort of 64-bit keys given as (hi, lo) u32 halves.

    Two stable 32-bit passes (LSD over words): sort by lo carrying hi,
    then by hi carrying lo — the standard multi-word extension of the
    reference's LSD scheme. Returns sorted (hi, lo).
    """
    if hi.shape != lo.shape:
        raise ValueError("hi and lo must have the same shape")
    if hi.dtype != jnp.uint32 or lo.dtype != jnp.uint32:
        raise TypeError("sort_u64 expects uint32 hi/lo halves")
    lo1, hi1 = sort_kv(lo, hi, config=config)
    hi2, lo2 = sort_kv(hi1, lo1, config=config)
    return hi2, lo2


def sort_kv_u64(hi, lo, values, *, config: Config | None = None):
    """Stable 64-bit-key sort carrying a 32-bit payload.

    Returns (hi, lo, values) sorted by the 64-bit (hi,lo) key, stable.
    """
    if not (hi.shape == lo.shape == values.shape):
        raise ValueError("hi, lo, values must have the same shape")
    if hi.dtype != jnp.uint32 or lo.dtype != jnp.uint32:
        raise TypeError("sort_kv_u64 expects uint32 hi/lo halves")
    lo1, (hi1, v1) = sort_multi_xla(lo, (hi, values))
    hi2, (lo2, v2) = sort_multi_xla(hi1, (lo1, v1))
    return hi2, lo2, v2
