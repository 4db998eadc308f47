"""Public sort API: keys-only and key-value stable LSD radix sort.

TPU-native replacement for ``Pprims::radixSort`` (both overloads,
``Tahoe/ParallelPrimitives/Pprims.h:37-41``, ``Pprims.cpp:200-406``).

Contract differences from the reference (all strict improvements):
  - no ``n % 256 == 0`` alignment requirement for keys-only sort
    (the reference asserts it, ``Pprims.cpp:327``); ragged n is handled by
    padding with 0xffffffff keys that sort to the tail and are sliced off —
    the same semantics the reference's KV path gets from CHECK_BOUNDARY
    (``RadixSortKeyValueKernels.cl:552-563``);
  - any ``sort_bits`` in 1..32 (the reference requires a multiple of 4,
    ``Pprims.cpp:330``);
  - engine selection is a runtime Config, not a compile-time device gate
    (``Pprims.cpp:189-198`` enableSortOnDevice analog).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config, default_config
from .sort_xla import sort_kv_xla, sort_xla

__all__ = ["sort", "sort_kv"]


# 16-bit key dtypes sort by exact monotone widening to their 32-bit
# counterpart (zero/sign-extend for ints; f16/bf16 -> f32 is exact), and
# the undo narrows back (every value round-trips exactly).
_WIDEN = {
    jnp.dtype(jnp.uint16): jnp.uint32,
    jnp.dtype(jnp.int16): jnp.int32,
    jnp.dtype(jnp.float16): jnp.float32,
    jnp.dtype(jnp.bfloat16): jnp.float32,
}


def _check_key_dtype(dtype, what: str = "sort"):
    if (dtype not in (jnp.uint32, jnp.int32, jnp.float32)
            and jnp.dtype(dtype) not in _WIDEN):
        raise TypeError(
            f"{what} supports u32/i32/f32 (or 16-bit u16/i16/f16/bf16) "
            f"keys, got {dtype}")


def _check_keys(keys):
    if keys.ndim != 1:
        raise ValueError("sort expects a 1D key array")
    _check_key_dtype(keys.dtype)


def _to_radix_u32(keys):
    """Map keys to u32 so unsigned radix order == the natural key order.

    u32: identity (the reference's only key type). i32: flip the sign bit
    (two's-complement -> offset-binary). f32: the classic monotone float
    transform (flip all bits of negatives, sign bit of positives); total
    order with NaN at the extremes. 16-bit dtypes widen exactly first.
    Returns (u32_keys, undo_fn).
    """
    dt = keys.dtype
    wide = _WIDEN.get(jnp.dtype(dt))
    if wide is not None:
        k, undo_wide = _to_radix_u32(keys.astype(wide))
        return k, lambda u: undo_wide(u).astype(dt)
    if dt == jnp.uint32:
        return keys, lambda k: k
    if dt == jnp.int32:
        sign = jnp.uint32(0x80000000)
        return (keys.view(jnp.uint32) ^ sign), (
            lambda k: (k ^ sign).view(jnp.int32))
    # float32
    bits = keys.view(jnp.uint32)
    mask = jnp.where(bits >> 31 == 1, jnp.uint32(0xFFFFFFFF),
                     jnp.uint32(0x80000000))
    fwd = bits ^ mask

    def undo(k):
        m = jnp.where(k >> 31 == 0, jnp.uint32(0xFFFFFFFF),
                      jnp.uint32(0x80000000))
        return (k ^ m).view(jnp.float32)

    return fwd, undo


def _pick_engine(cfg: Config) -> str:
    if cfg.engine != "auto":
        return cfg.engine
    return "pallas" if jax.default_backend() == "tpu" else "host"


def _order_mask(sort_bits: int):
    """All-ones over the participating key bits (for descending flips)."""
    return jnp.uint32(0xFFFFFFFF if sort_bits >= 32
                      else (1 << sort_bits) - 1)


def sort(keys, sort_bits: int = 32, *, descending: bool = False,
         config: Config | None = None):
    """Stable LSD radix sort of 32-bit keys by their low ``sort_bits`` bits.

    Analog of ``Pprims::radixSort(Buffer<u32>&, n, sortBits)``
    (``Pprims.cpp:304-406``), extended beyond the reference's u32-only
    contract: int32 keys sort in natural signed order and float32 keys in
    float order (monotone bit transforms; NaNs order by sign at the
    extremes).

    ``descending=True`` reverses the order (stable: equal keys keep
    their original relative order) at the cost of two elementwise
    passes — the engines run ascending on the complemented radix key,
    so a reverse-sorted input still hits the presorted fast path.
    """
    cfg = config or default_config()
    _check_keys(keys)
    if not (1 <= sort_bits <= 32):
        raise ValueError("sort_bits must be in 1..32")
    if keys.dtype != jnp.uint32 and sort_bits != 32:
        raise ValueError("partial sort_bits requires uint32 keys "
                         "(the reference's contract, Pprims.cpp:253)")
    n = keys.shape[0]
    if n <= 1:
        return keys

    k, undo = _to_radix_u32(keys)
    if descending:
        k = k ^ _order_mask(sort_bits)

    engine = _pick_engine(cfg)
    if engine == "host":
        out = sort_xla(k, sort_bits)
    else:
        from .sort_pallas import sort_pallas
        out = sort_pallas(k, sort_bits, cfg)
    if descending:
        out = out ^ _order_mask(sort_bits)
    return undo(out)


def sort_kv(keys, values, sort_bits: int = 32, *, stable: bool = True,
            descending: bool = False, config: Config | None = None):
    """Stable key-value LSD radix sort (sorts on keys; values follow).

    Analog of ``Pprims::radixSort(Buffer<uint2>&, n)``
    (``Pprims.cpp:200-302``). Values may be any 32-bit dtype.
    ``stable=False`` permits unspecified ordering of values under equal
    keys (beyond-reference: lets the TPU engine drop its tie-break
    stream, ~1.5x faster; backends that are naturally stable may ignore
    the hint — a stable result is a valid unstable result).
    """
    cfg = config or default_config()
    _check_keys(keys)
    if values.shape != keys.shape:
        raise ValueError("keys and values must have the same shape")
    if not (1 <= sort_bits <= 32):
        raise ValueError("sort_bits must be in 1..32")
    if keys.dtype != jnp.uint32 and sort_bits != 32:
        raise ValueError("partial sort_bits requires uint32 keys "
                         "(the reference's contract, Pprims.cpp:253)")
    n = keys.shape[0]
    if n <= 1:
        return keys, values

    k, undo = _to_radix_u32(keys)
    if descending:
        k = k ^ _order_mask(sort_bits)

    engine = _pick_engine(cfg)
    if engine == "host":
        ks, vs = sort_kv_xla(k, values, sort_bits)
    else:
        from .sort_pallas import sort_kv_pallas
        ks, vs = sort_kv_pallas(k, values, sort_bits, cfg, stable=stable)
    if descending:
        ks = ks ^ _order_mask(sort_bits)
    return undo(ks), vs
