"""TPU Pallas radix sort engine.

TPU-native re-design of the reference's 3-kernel GPU pipeline
(``StreamCountKernel`` -> ``PrefixScan*Kernel`` -> ``SortAndScatterKernel``,
``Tahoe/ClKernels/RadixSort32Kernels.cl``; host orchestration
``Pprims.cpp:304-406``). See sort.py for the public contract.

v1 status: the fused Pallas pass pipeline is under construction; this module
currently routes through the XLA engine so the dispatch surface is stable.
"""

from __future__ import annotations

from ..config import Config
from .sort_xla import sort_kv_xla, sort_xla

__all__ = ["sort_pallas", "sort_kv_pallas"]


def sort_pallas(keys, sort_bits: int, cfg: Config):
    return sort_xla(keys, sort_bits)


def sort_kv_pallas(keys, values, sort_bits: int, cfg: Config):
    return sort_kv_xla(keys, values, sort_bits)
