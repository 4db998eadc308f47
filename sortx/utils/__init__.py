"""Utilities: logging and scalar math helpers (Tahoe/Base + Tahoe/Math analog)."""

from .errors import SortxError, debug_enabled, set_debug, sortx_assert
from .log import Channel, LogWriter, log, log_debug, log_error
from .math import cdiv, clamp, is_pow2, next_multiple_of, next_pow2

__all__ = [
    "SortxError",
    "sortx_assert",
    "set_debug",
    "debug_enabled",
    "Channel",
    "LogWriter",
    "log",
    "log_debug",
    "log_error",
    "cdiv",
    "clamp",
    "is_pow2",
    "next_multiple_of",
    "next_pow2",
]
