"""Distributed layer: mesh, collectives, multi-chip sort (new scope)."""

from .dist_sort import dist_sort, dist_sort_kv
from .mesh import AXIS, make_sort_mesh, shard_1d

__all__ = ["dist_sort", "dist_sort_kv", "make_sort_mesh", "shard_1d", "AXIS"]
