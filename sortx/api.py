"""Device-bound facade mirroring the reference's ``Pprims`` class shape.

The reference exposes its primitives through a device-bound object that
owns persistent work buffers (``Pprims::Pprims(const Device*)``,
``Tahoe/ParallelPrimitives/Pprims.h:15-41``). JAX doesn't need manual work
buffers (XLA manages temporaries), but the facade is kept so a user
migrating from the reference finds the same call shape:

    pp = sortx.ParallelPrimitives(device)        # Pprims p(device)
    pp.radix_sort(buf)                            # p.radixSort(d, buf, n)
    pp.radix_sort_kv(kbuf, vbuf)                  # p.radixSort(d, kv, n)
    pp.scan(dst, src, with_total=True)            # p.scan(d, dst, src, n, &s)

Buffers are ``sortx.runtime.Buffer`` objects; results are written back into
them (matching the reference's in-out Buffer semantics).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .config import Config, default_config
from .ops import scan as _scan, sort as _sort, sort_kv as _sort_kv
from .runtime.buffer import Buffer
from .runtime.device import SortxDevice, allocate_device

__all__ = ["ParallelPrimitives"]


class ParallelPrimitives:
    """Primitive API facade bound to a device (Pprims analog)."""

    def __init__(self, device: Optional[SortxDevice] = None,
                 config: Optional[Config] = None):
        self.device = device or allocate_device()
        self.config = config or default_config()

    # -- Pprims::radixSort(Buffer<u32>&, n, sortBits) ------------------
    def radix_sort(self, keys: Buffer, n: Optional[int] = None,
                   sort_bits: int = 32) -> None:
        """Sort the buffer's first n keys in place (keys-only overload)."""
        n = keys.size if n is None else n
        out = _sort(keys.array[:n], sort_bits, config=self.config)
        if n == keys.size:
            keys.array = out
        else:
            keys.array = keys.array.at[:n].set(out)

    # -- Pprims::radixSort(Buffer<uint2>&, n) --------------------------
    def radix_sort_kv(self, keys: Buffer, values: Buffer,
                      n: Optional[int] = None, sort_bits: int = 32) -> None:
        """Stable key-value sort in place."""
        n = keys.size if n is None else n
        ks, vs = _sort_kv(keys.array[:n], values.array[:n], sort_bits,
                          config=self.config)
        if n == keys.size:
            keys.array, values.array = ks, vs
        else:
            keys.array = keys.array.at[:n].set(ks)
            values.array = values.array.at[:n].set(vs)

    # -- Pprims::scan(Buffer& dst, Buffer& src, n, sum*) ---------------
    def scan(self, dst: Buffer, src: Buffer, n: Optional[int] = None,
             with_total: bool = False):
        """Exclusive prefix sum src -> dst; optionally return the total.

        Unlike the reference (hard failure above 2^20 elements,
        ``Pprims.cpp:134-138``), any size is supported.
        """
        n = src.size if n is None else n
        res = _scan(src.array[:n].view(jnp.int32), with_total=with_total,
                    config=self.config)
        out, total = res if with_total else (res, None)
        out = out.view(dst.dtype) if dst.dtype != out.dtype else out
        if n == dst.size:
            dst.array = out
        else:
            dst.array = dst.array.at[:n].set(out)
        if with_total:
            # Reference returns the sum through a u32 out-param
            # (Pprims.h:35); match dst's dtype rather than leaking i32.
            return total.view(dst.dtype) if dst.dtype != total.dtype \
                else total
        return None
