"""Round-5 one-off adversarial fuzz campaign (beyond the suite).

The suite fuzzes each op; this campaign fuzzes COMBINATIONS —
descending x partial bits x dtypes x engines x configs — with extra
weight on round-5 surfaces: packed partial boundaries (sort_bits +
log_n near 32), 64-bit values, ring/tree/rank/native dist configs,
armed captures interleaved with ops. Oracle: numpy. Any failure prints
a REPRO line with the seed.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.abspath(os.path.join(os.path.dirname(__file__),
                                               "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import jax.numpy as jnp

import sortx
from sortx import reference

FAILS = []


def check(cond, seed, what):
    if not cond:
        FAILS.append((seed, what))
        print(f"FAIL seed={seed}: {what}", flush=True)


def trial_sort(rng, seed):
    n = int(rng.randint(1, 60_000))
    bits = int(rng.choice([1, 3, 4, 5, 8, 13, 16, 17, 19, 20, 24, 31,
                           32, 32]))
    desc = bool(rng.randint(0, 2))
    kind = rng.randint(0, 4)
    if kind == 0:
        keys = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    elif kind == 1:
        keys = rng.randint(0, 4, size=n).astype(np.uint32)
    elif kind == 2:
        keys = np.full(n, rng.randint(0, 2**32), np.uint32)
    else:
        keys = np.sort(rng.randint(0, 2**32, size=n, dtype=np.uint32))
        if rng.randint(0, 2):
            keys = keys[::-1].copy()
    exp = reference.radix_sort(keys, bits)
    if desc:
        # stable descending on masked bits: reverse runs of equal
        # masked keys keep original order -> use numpy lexsort oracle
        mask = np.uint32((1 << bits) - 1) if bits < 32 else \
            np.uint32(0xFFFFFFFF)
        mk = keys & mask
        order = np.lexsort((np.arange(n), (~mk).astype(np.uint32)))
        exp = keys[order]
    got = np.asarray(sortx.sort(jnp.asarray(keys), bits,
                                descending=desc))
    check(np.array_equal(got, exp), seed,
          f"sort n={n} bits={bits} desc={desc} kind={kind}")


def trial_kv(rng, seed):
    n = int(rng.randint(1, 40_000))
    bits = int(rng.choice([4, 8, 16, 19, 20, 32, 32]))
    desc = bool(rng.randint(0, 2))
    v64 = bool(rng.randint(0, 3) == 0)
    keys = rng.randint(0, max(2, n // 10), size=n).astype(np.uint32)
    if v64:
        vals = rng.randint(0, 2**63, size=n).astype(np.uint64)
    else:
        vals = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    mask = np.uint32((1 << bits) - 1) if bits < 32 else \
        np.uint32(0xFFFFFFFF)
    mk = keys & mask
    key_for_order = (~mk).astype(np.uint32) if desc else mk
    order = np.lexsort((np.arange(n), key_for_order))
    ctx = jax.enable_x64(True) if v64 else None
    try:
        if ctx:
            ctx.__enter__()
        ks, vs = sortx.sort_kv(jnp.asarray(keys), jnp.asarray(vals),
                               bits, descending=desc)
        ks, vs = np.asarray(ks), np.asarray(vs)
    finally:
        if ctx:
            ctx.__exit__(None, None, None)
    check(np.array_equal(ks, keys[order]) and
          np.array_equal(vs, vals[order]), seed,
          f"sort_kv n={n} bits={bits} desc={desc} v64={v64}")


def trial_dist(rng, seed):
    from sortx.parallel import dist_sort, dist_sort_kv, make_sort_mesh

    n = int(rng.randint(1, 25_000))
    mesh = make_sort_mesh()
    merge = str(rng.choice(["auto", "sort", "rank", "native"]))
    bounded = bool(rng.randint(0, 2))
    cfg = sortx.Config(dist_local_merge=merge,
                       dist_dense_bounded=bounded)
    kv = bool(rng.randint(0, 2))
    kind = rng.randint(0, 3)
    if kind == 0:
        keys = rng.randint(0, 2**32, size=n, dtype=np.uint32)
    elif kind == 1:
        keys = rng.randint(0, 3, size=n).astype(np.uint32)
    else:
        keys = np.full(n, 0xFFFFFFFF, np.uint32)
    if kv:
        vals = np.arange(n, dtype=np.uint32)
        ks, vs = dist_sort_kv(jnp.asarray(keys), jnp.asarray(vals),
                              mesh=mesh, config=cfg)
        order = np.argsort(keys, kind="stable")
        ok = (np.array_equal(np.asarray(ks), keys[order])
              and np.array_equal(np.asarray(vs),
                                 order.astype(np.uint32)))
    else:
        got = np.asarray(dist_sort(jnp.asarray(keys), mesh=mesh,
                                   config=cfg))
        ok = np.array_equal(got, np.sort(keys))
    check(ok, seed, f"dist n={n} merge={merge} bounded={bounded} "
          f"kv={kv} kind={kind}")


def trial_misc(rng, seed):
    n = int(rng.randint(2, 30_000))
    keys = rng.randint(0, max(2, n // 7), size=n).astype(np.uint32)
    which = rng.randint(0, 5)
    if which == 0:
        got = np.asarray(sortx.argsort(jnp.asarray(keys)))
        check(np.array_equal(got, np.argsort(keys, kind="stable")),
              seed, f"argsort n={n}")
    elif which == 1:
        vals = rng.randint(0, 2**32, size=n, dtype=np.uint32)
        got = np.asarray(sortx.scan_by_key(jnp.asarray(keys),
                                           jnp.asarray(vals)))
        exp = np.zeros_like(vals)
        acc = 0
        for i in range(n):
            acc = (acc + int(vals[i - 1])) & 0xFFFFFFFF \
                if i and keys[i] == keys[i - 1] else 0
            exp[i] = acc
        check(np.array_equal(got, exp), seed, f"scan_by_key n={n}")
    elif which == 2:
        k = int(rng.randint(1, n + 1))
        got = np.asarray(sortx.top_k(jnp.asarray(keys), k))
        check(np.array_equal(got, np.sort(keys)[::-1][:k]), seed,
              f"top_k n={n} k={k}")
    elif which == 3:
        size = int(rng.randint(1, 500))
        v, c, nu = sortx.unique(jnp.asarray(keys), size)
        ev, ec = np.unique(keys, return_counts=True)
        kk = min(len(ev), size)
        check(int(nu) == len(ev)
              and np.array_equal(np.asarray(v)[:kk], ev[:kk])
              and np.array_equal(np.asarray(c)[:kk], ec[:kk]),
              seed, f"unique n={n} size={size}")
    else:
        cuts = np.sort(rng.randint(0, n + 1,
                                   size=int(rng.randint(0, 20))))
        off = np.concatenate([[0], cuts, [n]]).astype(np.int32)
        got = np.asarray(sortx.sort_segments(
            jnp.asarray(keys), jnp.asarray(off)))
        exp = keys.copy()
        for i in range(len(off) - 1):
            exp[off[i]:off[i + 1]] = np.sort(exp[off[i]:off[i + 1]])
        check(np.array_equal(got, exp), seed,
              f"sort_segments n={n} segs={len(off)-1}")


def main():
    import time
    t0 = time.time()
    trials = 0
    for seed in range(int(os.environ.get("FUZZ_BASE", "5000")), int(os.environ.get("FUZZ_BASE", "5000")) + 400):
        rng = np.random.RandomState(seed)
        kind = seed % 4
        try:
            if kind == 0:
                trial_sort(rng, seed)
            elif kind == 1:
                trial_kv(rng, seed)
            elif kind == 2:
                trial_misc(rng, seed)
            else:
                if seed % 16 == 3:      # dist trials are slow: 1 in 4
                    trial_dist(rng, seed)
        except Exception as e:
            FAILS.append((seed, repr(e)[:200]))
            print(f"EXC seed={seed}: {e!r}"[:300], flush=True)
        trials += 1
        if time.time() - t0 > 1500:
            print(f"time box hit at seed {seed}", flush=True)
            break
    print(f"campaign: {trials} trials, {len(FAILS)} failures", flush=True)
    if FAILS:
        for s, w in FAILS[:20]:
            print("  ", s, w)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
