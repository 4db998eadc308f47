"""Round-5: record WHY the geometry probes reject (for DESIGN_NOTES)
and which lb_bd each stream-count path actually selects on this stack.
"""

import logging
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.environ["JAX_COMPILATION_CACHE_DIR"]))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

logging.basicConfig(level=logging.INFO)
logging.getLogger("sortx").setLevel(logging.INFO)

from sortx.ops import bitonic

print(f"backend={jax.default_backend()}", flush=True)

cases = [
    ("b", 1, 1, 20, False, 1),       # the lb20 blocker
    ("b", 2, 2, 18, False, 1),       # the r3 kv-unstable regression pt
    ("b", 3, 2, 18, False, 1),       # stable-KV escalation candidate
    ("b", 3, 2, 19, False, 1),
    ("cont", 1, 1, 19, False, 18),
]
for c in cases:
    ok = bitonic._probe_geometry(*c[:4], tie_break=c[4], s_start=c[5])
    print(f"probe {c}: {'OK' if ok else 'REJECTED'}", flush=True)

for ns, nk, lb, label in [(1, 1, 17, "keys-only"),
                          (2, 1, 16, "kv-unstable(pow2)"),
                          (2, 2, 16, "u64"),
                          (3, 2, 16, "kv-stable")]:
    got = bitonic._bd_block(lb, ns, 27, num_keys=nk)
    print(f"{label}: lb={lb} -> lb_bd={got}", flush=True)
