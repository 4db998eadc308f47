"""Round-5: can kernel A's per-stage layout transitions fuse?

Between stage s's transposed TAIL and stage s+1's MID region the
engine round-trips through the normal layout: tail_exit (swapaxes +
tile transpose) then mid_enter (swapaxes) — the composition is a
single 3D axis swap (c,h,r) -> (r,h,c), i.e. swapaxes(0,2) on
[128, H, 128]. If Mosaic lowers that form cheaply, ~0.5 ms/stage of
pure permutes could fuse away; round 3 found ONE fused form
(transpose(1,2,0)) lowers ELEMENT-SERIALLY (15.8 ms), so this needs a
probe before any engine change.

Measures per-pass cost of each candidate over 2^27 elements.
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.environ["JAX_COMPILATION_CACHE_DIR"]))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 27
ROWS = 1024          # lb17 block
H = ROWS // 128


def make_kernel(form):
    def kern(i_ref, o_ref):
        v = i_ref[...]
        if form == "copy":
            pass
        elif form == "swap02":
            # (c, h, r) -> (r, h, c): the fused tail_exit+mid_enter
            v = v.reshape(128, H, 128).swapaxes(0, 2).reshape(ROWS, 128)
        elif form == "swap02_t":
            v = v.reshape(128, H, 128).transpose(2, 1, 0).reshape(ROWS,
                                                                  128)
        elif form == "exit_enter":
            # current two-step route through normal layout
            v = v.reshape(128, H, 128).swapaxes(0, 1).reshape(ROWS, 128)
            v = v.reshape(H, 128, 128).swapaxes(1, 2).reshape(ROWS, 128)
            v = v.reshape(H, 128, 128).swapaxes(0, 1).reshape(ROWS, 128)
        elif form == "tile_t":
            v = v.reshape(H, 128, 128).swapaxes(1, 2).reshape(ROWS, 128)
        o_ref[...] = v

    return kern


def _sync(r):
    return float(jnp.sum(r[-8:, -8:].astype(jnp.float32)))


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    x = jax.random.bits(jax.random.PRNGKey(0), (N // 128, 128),
                        dtype=jnp.uint32)
    spec = pl.BlockSpec((ROWS, 128), lambda i: (i, np.int32(0)),
                        memory_space=pltpu.VMEM)
    for form in ("copy", "tile_t", "exit_enter", "swap02", "swap02_t"):
        try:
            f = pl.pallas_call(
                make_kernel(form), grid=(N // 128 // ROWS,),
                in_specs=[spec], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((N // 128, 128),
                                               jnp.uint32))
            g = jax.jit(f)
            r = g(x)
            _sync(r)

            def total(k):
                t0 = time.perf_counter()
                rr = x
                for _ in range(k):
                    rr = g(rr)
                _sync(rr)
                return time.perf_counter() - t0

            t_lo = min(total(2) for _ in range(3))
            t_hi = min(total(10) for _ in range(3))
            dt = max(t_hi - t_lo, 1e-9) / 8
            print(f"{form:11s}: {dt*1e3:.2f} ms/pass", flush=True)
        except Exception as e:
            print(f"{form:11s}: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
