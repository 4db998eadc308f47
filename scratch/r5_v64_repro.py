"""Repro: kv_v64 RecursionError at 2^27 on TPU (bench extra)."""
import os
import sys
import traceback

sys.setrecursionlimit(100_000)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.environ["JAX_COMPILATION_CACHE_DIR"]))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

import sortx

print("backend", jax.default_backend(), flush=True)
for logn in (24, 27):
    n = 1 << logn
    keys = jax.random.bits(jax.random.PRNGKey(0), (n,), dtype=jnp.uint32)
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        v64 = keys.astype(jnp.uint64) << jnp.uint64(32)

        f = jax.jit(lambda k, v: sortx.sort_kv(k, v))
        try:
            out = f.lower(keys, v64)
            print(f"n=2^{logn}: lower OK", flush=True)
            c = out.compile()
            print(f"n=2^{logn}: compile OK", flush=True)
            ks, vs = c(keys, v64)
            print(f"n=2^{logn}: run OK",
                  float(jnp.sum(ks[-4:].astype(jnp.float32))), flush=True)
        except RecursionError:
            tb = traceback.format_exc()
            # print the DEEP frames (the repeating pattern) + the tail
            lines = tb.splitlines()
            print(f"n=2^{logn}: RecursionError; {len(lines)} tb lines",
                  flush=True)
            print("\n".join(lines[:30]), flush=True)
            print("...", flush=True)
            print("\n".join(lines[-30:]), flush=True)
            break
    finally:
        jax.config.update("jax_enable_x64", old)
