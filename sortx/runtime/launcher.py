"""Kernel launch wrapper: profiling + capture/replay.

TPU-native analog of ``Launcher`` / ``LauncherCL``
(``Adl/AdlKernel.h:59-143``, ``Adl/CL/AdlKernelUtilsCL.inl:541-791``).
JAX's ``jit`` already subsumes arg binding and dispatch; what this layer
adds — the parts of the reference with no JAX builtin — is:

  - per-launch CSV profiling (``Device::toggleProfiling`` ->
    ``ProfileCL.<device>.csv`` with kernel name, ms, shape;
    ``AdlKernelUtilsCL.inl:664-677``), via forced sync + host clock,
    exactly the reference's debug recipe;
  - launch capture to disk and replay (``serializeToFile`` /
    ``deserializeFromFile``, ``AdlKernelUtilsCL.inl:680-791``): dump every
    input array + static config of one launch to an ``.npz`` for offline
    repro, and re-run it later.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Optional

import jax
import numpy as np

from ..utils.log import Channel, log

__all__ = ["Launcher", "replay", "toggle_profiling", "profiling_enabled"]

_PROFILE = {"enabled": False, "path": None}


def toggle_profiling(enable: bool, csv_path: Optional[str] = None) -> None:
    """Analog of Device::toggleProfiling (Adl/Adl.h:142,153)."""
    _PROFILE["enabled"] = enable
    if csv_path:
        _PROFILE["path"] = csv_path


def profiling_enabled() -> bool:
    return _PROFILE["enabled"]


def _profile_path() -> str:
    if _PROFILE["path"] is None:
        dev = jax.devices()[0]
        kind = getattr(dev, "device_kind", "dev").replace(" ", "_")
        _PROFILE["path"] = f"Profile.{kind}.csv"
    return _PROFILE["path"]


class Launcher:
    """Wraps a jitted callable with profiling and capture hooks.

    Unlike the reference's per-launch arg binding (setBuffers/setConst,
    ``Adl/AdlKernel.inl:240-293``), args are plain Python calls; the
    Launcher records them when capture or profiling is on.
    """

    def __init__(self, fn: Callable, name: str, *,
                 static_config: Optional[dict] = None):
        self.fn = fn
        self.name = name
        self.static_config = static_config or {}

    def __call__(self, *args):
        if not _PROFILE["enabled"]:
            return self.fn(*args)
        # Reference recipe: sync before, run, sync after, host clock
        # (AdlKernelUtilsCL.inl:664-677 forces finish around the launch).
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = self.fn(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) * 1e3
        shapes = ";".join(f"{a.shape}/{a.dtype}" for a in args
                          if hasattr(a, "shape"))
        with open(_profile_path(), "a") as f:
            f.write(f"{self.name},{ms:.6f},{shapes}\n")
        log(f"launch {self.name}: {ms:.3f} ms", Channel.PERF)
        return out

    # -- capture/replay (serializeToFile analog) ----------------------
    def capture(self, path: str, *args) -> Any:
        """Run the launch AND dump its full inputs + config to ``path``.

        Analog of LauncherCL::serializeToFile
        (``Adl/CL/AdlKernelUtilsCL.inl:680-734``), which dumps every bound
        buffer + scalar + grid dims to a binary file.
        """
        arrays = {f"arg{i}": np.asarray(a) for i, a in enumerate(args)
                  if hasattr(a, "shape")}
        scalars = {f"arg{i}": a for i, a in enumerate(args)
                   if not hasattr(a, "shape")}
        meta = {
            "name": self.name,
            "static_config": self.static_config,
            "scalars": scalars,
            "n_args": len(args),
        }
        np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)
        return self.fn(*args)


def replay(path: str, registry: dict[str, Callable]) -> Any:
    """Re-run a captured launch (deserializeFromFile analog,
    ``Adl/CL/AdlKernelUtilsCL.inl:736-791``).

    ``registry`` maps launch names to callables (the reference re-binds the
    kernel by name through KernelManager).
    """
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    fn = registry[meta["name"]]
    args: list[Any] = []
    for i in range(meta["n_args"]):
        key = f"arg{i}"
        if key in data:
            args.append(jax.numpy.asarray(data[key]))
        else:
            args.append(meta["scalars"][key])
    return fn(*args)
