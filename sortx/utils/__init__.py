"""Utilities: logging and scalar math helpers (Tahoe/Base + Tahoe/Math analog)."""

from .log import Channel, LogWriter, log, log_debug, log_error
from .math import cdiv, clamp, is_pow2, next_multiple_of, next_pow2

__all__ = [
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
