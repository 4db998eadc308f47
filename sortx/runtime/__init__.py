"""Runtime layer: device/buffer/launch/profiling (Adl analog)."""

from . import native
from . import profiler
from .buffer import Buffer, SyncObject
from .cache import enable_cache, warmup
from .device import DeviceConfig, SortxDevice, allocate_device, device_count
from .launcher import Launcher, profiling_enabled, replay, toggle_profiling
from .mirror import MirroredArray, MirrorState
from .stopwatch import Stopwatch

__all__ = [
    "Buffer",
    "SyncObject",
    "DeviceConfig",
    "SortxDevice",
    "allocate_device",
    "device_count",
    "Launcher",
    "replay",
    "toggle_profiling",
    "profiling_enabled",
    "MirroredArray",
    "MirrorState",
    "Stopwatch",
    "enable_cache",
    "warmup",
    "profiler",
    "native",
]
