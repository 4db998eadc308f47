"""Algorithm layer: parallel primitives (Tahoe/ParallelPrimitives analog)."""

from .scan import scan, cumsum_lanes, cumsum_sublanes
from .sort import sort, sort_kv
from .sort_xla import sort_xla, sort_kv_xla

__all__ = [
    "scan",
    "sort",
    "sort_kv",
    "sort_xla",
    "sort_kv_xla",
    "cumsum_lanes",
    "cumsum_sublanes",
]
