"""Round-5: phase breakdown of dist_sort (keys-only fast path) on the
CPU mesh at d=4 / 4 cores — where does the 0.352 weak-scaling
efficiency go? Rebuilds the _shard_sort keys-only pipeline from the
REAL internals with an early-exit `stages` knob and times each prefix.

Also: a micro-probe of whether XLA:CPU can overlap an all_to_all with
independent local compute (the premise of any exchange/merge pipelining
on this backend).
"""

import os
import time

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.abspath(os.path.join(os.path.dirname(__file__), "..",
                                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

import importlib

import sortx
from sortx.parallel import make_sort_mesh, shard_1d
from sortx.parallel.mesh import AXIS

# NB: `import sortx.parallel.dist_sort` binds the re-exported FUNCTION.
ds = importlib.import_module("sortx.parallel.dist_sort")

D = 4
LOGM = 22
M = 1 << LOGM
N = D * M


def timeit(fn, *args, iters=3):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def shard_sort_keys(keys, *, d, m, s_samples, axis_name, cfg, stages):
    """Keys-only fast-path pipeline, same math as ds._shard_sort,
    truncated after `stages`: 1=local sort, 2=+splitters+plan,
    3=+exchange, 4=+merge, 5=+rebalance (full)."""
    me = lax.axis_index(axis_name)
    cap = ds._dense_cell_cap(m, d)
    mk = keys
    smk = ds._local_sort_keys(mk, "xla", cfg)
    if stages <= 1:
        return smk
    samp_idx = jnp.array([(i + 1) * m // (s_samples + 1)
                          for i in range(s_samples)], jnp.int32)
    my_k = smk[samp_idx]
    all_k = lax.all_gather(my_k, axis_name).reshape(-1)
    all_p = jnp.tile(samp_idx, d)
    all_s = jnp.repeat(jnp.arange(d, dtype=jnp.int32), s_samples)
    gk, gs, gp = lax.sort([all_k, all_s, all_p], num_keys=1, is_stable=True)
    spl_rank = jnp.array([(j + 1) * s_samples for j in range(d - 1)],
                         jnp.int32)
    spl_k, spl_s, spl_p = gk[spl_rank], gs[spl_rank], gp[spl_rank]
    lt = jnp.searchsorted(smk, spl_k, side="left").astype(jnp.int32)
    rt = jnp.searchsorted(smk, spl_k, side="right").astype(jnp.int32)
    b = jnp.where(spl_s < me, lt, jnp.where(spl_s > me, rt, spl_p))
    dest = jnp.searchsorted(b, jnp.arange(m, dtype=jnp.int32),
                            side="right").astype(jnp.int32)
    send_sizes, input_offsets = ds._segment_layout(dest, d)
    c = lax.all_gather(send_sizes, axis_name)
    send_out_off, recv_sizes = ds._plan_from_counts(c, me)
    recv_total = jnp.sum(recv_sizes)
    buf = ds._recv_buf_len(m, d, s_samples)
    if stages <= 2:
        return smk, send_sizes, input_offsets, send_out_off, recv_sizes
    r_full = ds._exchange_dense_bounded(
        smk, send_sizes, input_offsets, send_out_off, recv_sizes, buf,
        axis_name, ds._SENTINEL, d, cap)
    if stages <= 3:
        return r_full
    m_full = ds._local_sort_keys(r_full, "xla", cfg)
    if stages <= 4:
        return m_full
    tot_per_shard = jnp.sum(c, axis=0)
    g = jnp.cumsum(tot_per_shard) - tot_per_shard
    my_g = g[me]
    k_idx = lax.iota(jnp.int32, buf)
    q = my_g + k_idx
    dest2 = jnp.where(k_idx < recv_total,
                      jnp.minimum(q // m, d - 1).astype(jnp.int32), d)
    send_sizes2, input_offsets2 = ds._segment_layout(dest2, d)
    seg_start_q = my_g + input_offsets2
    send_out_off2 = jnp.clip(seg_start_q - jnp.arange(d) * m, 0, m)
    send_out_off2 = send_out_off2.astype(jnp.int32)
    c2 = lax.all_gather(send_sizes2, axis_name)
    _, recv_sizes2 = ds._plan_from_counts(c2, me)
    out = ds._exchange_dense_bounded(
        m_full, send_sizes2, input_offsets2, send_out_off2, recv_sizes2,
        m, axis_name, ds._SENTINEL, d, cap)
    return out


def main():
    mesh = make_sort_mesh(D)
    cfg = sortx.default_config()
    keys = jax.random.bits(jax.random.PRNGKey(0), (N,), dtype=jnp.uint32)
    keys = shard_1d(keys, mesh)
    s_samples = min(M, max(max(D, min(64, M)), D * D * D))

    print(f"d={D} m=2^{LOGM} s={s_samples} cores={os.cpu_count()}")

    # single-device plain sort of m (per-device ideal work)
    k1 = jax.random.bits(jax.random.PRNGKey(1), (M,), dtype=jnp.uint32)
    t1 = timeit(jax.jit(lambda k: lax.sort(k)), k1)
    print(f"lax.sort(m) single-device: {t1*1e3:.1f} ms")

    for stages, name in [(1, "local sort"),
                         (3, "+exchange"), (4, "+merge(re-sort)"),
                         (5, "+rebalance (full)")]:
        fn = jax.jit(jax.shard_map(
            lambda k: shard_sort_keys(k, d=D, m=M, s_samples=s_samples,
                                      axis_name=AXIS, cfg=cfg,
                                      stages=stages),
            mesh=mesh, in_specs=(P(AXIS),),
            out_specs=P(AXIS) if stages != 2 else (P(AXIS),) * 5,
            check_vma=False))
        dt = timeit(fn, keys)
        print(f"stages<={stages} {name:20s}: {dt*1e3:7.1f} ms")

    # real dist_sort for reference
    t_full = timeit(lambda k: ds.dist_sort(k, mesh=mesh), keys)
    print(f"dist_sort (real, incl. wrapper): {t_full*1e3:.1f} ms "
          f"-> eff={M / (t_full / D) / (M / t1) / D:.3f}")

    # --- overlap micro-probe -----------------------------------------
    # iter body: y = all_to_all(x) ; z = independent compute(w).
    # If XLA:CPU overlaps, t(both) << t(a2a) + t(compute).
    W = 1 << 22

    def compute(w):
        for _ in range(4):
            w = jnp.sort(w)[::-1]
        return w

    def body_a2a(x):
        c = x.reshape(D, -1)
        return lax.all_to_all(c, AXIS, split_axis=0, concat_axis=0,
                              tiled=False).reshape(-1)

    x = shard_1d(jax.random.bits(jax.random.PRNGKey(2), (D * W,),
                                 dtype=jnp.uint32), mesh)
    w = shard_1d(jax.random.bits(jax.random.PRNGKey(3), (D * W,),
                                 dtype=jnp.uint32), mesh)

    f_a2a = jax.jit(jax.shard_map(body_a2a, mesh=mesh, in_specs=(P(AXIS),),
                                  out_specs=P(AXIS), check_vma=False))
    f_cmp = jax.jit(jax.shard_map(compute, mesh=mesh, in_specs=(P(AXIS),),
                                  out_specs=P(AXIS), check_vma=False))
    f_both = jax.jit(jax.shard_map(
        lambda x, w: (body_a2a(x), compute(w)), mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)), out_specs=(P(AXIS), P(AXIS)),
        check_vma=False))
    ta = timeit(f_a2a, x)
    tc = timeit(f_cmp, w)
    tb = timeit(f_both, x, w)
    print(f"a2a {ta*1e3:.1f} ms, compute {tc*1e3:.1f} ms, "
          f"both-in-one-program {tb*1e3:.1f} ms "
          f"(sum {1e3*(ta+tc):.1f}) overlap={'YES' if tb < 0.8*(ta+tc) else 'NO'}")


if __name__ == "__main__":
    main()
