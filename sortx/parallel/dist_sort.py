"""Multi-chip distributed stable sort (new scope; SURVEY §7 S5).

The reference is strictly single-device (SURVEY §2.6: "No multi-queue,
multi-device, multi-process, or network parallelism of any kind"); this
module is the new-scope distributed layer from BASELINE.json: keys
partitioned across a 1D device mesh, one skew-aware repartition, local
sorts, and an exact rebalance — stability and ordering bit-identical to the
single-chip sort.

Algorithm: regular-sample sort (PSRS) with exact stability.
  1. Local stable sort per shard (by masked key; full key + payload ride).
  2. Regular samples (every m/(S+1)-th of the sorted shard) -> all_gather ->
     global splitters. Elements are compared as (key, shard, local_rank)
     lexicographically, which equals the global stable order, so duplicate-
     heavy (skewed) keys split EXACTLY: an all-equal-keys input still
     partitions into balanced rank ranges. The PSRS regular-sampling theorem
     bounds any partition below 2m, so the fixed receive buffer of 2m never
     overflows — no dynamic shapes.
  3. Ragged all-to-all (ICI collective; falls back to a dense gather-based
     all_to_all where the ragged collective is unavailable).
  4. Local stable merge of the received runs.
  5. Exact rebalance to even [n/D] output shards (second, boundary-only
     ragged exchange), so the output contract matches the input: an evenly
     sharded, globally sorted array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config, default_config
from ..utils.math import cdiv
from .mesh import AXIS, make_sort_mesh

__all__ = ["dist_sort", "dist_sort_kv"]

# Plain int, NOT jnp.uint32: a module-level jax array would initialize
# the backend at import time (breaking later platform overrides).
_SENTINEL = 0xFFFFFFFF


def _exchange_ragged(operand, send_sizes, input_offsets, output_offsets,
                     recv_sizes, out_len: int, axis_name: str, fill):
    """Ragged all-to-all of contiguous segments; output buffer [out_len]."""
    out = jnp.full((out_len,) + operand.shape[1:], fill, operand.dtype)
    return lax.ragged_all_to_all(
        operand, out, input_offsets, send_sizes, output_offsets, recv_sizes,
        axis_name=axis_name)


def _exchange_dense(operand, send_sizes, input_offsets, output_offsets,
                    recv_sizes, out_len: int, axis_name: str, fill,
                    axis_size: int):
    """Fallback exchange via pad-to-max all_to_all + gather compaction.

    Used where RaggedAllToAll is not implemented by the backend. Each cell
    is padded to the local shard size m (a shard can send at most its whole
    block to one destination), so correctness never depends on sample
    quality.
    """
    d = axis_size
    m = operand.shape[0]
    col = lax.broadcasted_iota(jnp.int32, (d, m), 1)
    src_idx = jnp.clip(input_offsets[:, None] + col, 0, m - 1)
    cells = jnp.take(operand, src_idx, axis=0)          # [D, m] padded cells
    swapped = lax.all_to_all(cells, axis_name, split_axis=0, concat_axis=0,
                             tiled=False)
    # swapped[i] = segment from shard i (size recv_sizes[i], left-aligned).
    starts = jnp.cumsum(recv_sizes) - recv_sizes        # my recv offsets
    t = lax.broadcasted_iota(jnp.int32, (out_len,), 0)
    row = jnp.searchsorted(starts, t, side="right") - 1
    k = t - starts[row]
    total = jnp.sum(recv_sizes)
    val = swapped[row, jnp.clip(k, 0, m - 1)]
    return jnp.where((t < total) & (k < m), val,
                     jnp.asarray(fill, operand.dtype))


def _mk_exchange(ragged: bool, axis_name: str, axis_size: int):
    if ragged:
        return functools.partial(_exchange_ragged, axis_name=axis_name)
    return functools.partial(_exchange_dense, axis_name=axis_name,
                             axis_size=axis_size)


def _segment_layout(dest, d: int):
    """dest is monotone per sorted element; return (sizes, offsets) per dest."""
    offsets = jnp.searchsorted(dest, jnp.arange(d, dtype=dest.dtype),
                               side="left").astype(jnp.int32)
    ends = jnp.searchsorted(dest, jnp.arange(d, dtype=dest.dtype),
                            side="right").astype(jnp.int32)
    return ends - offsets, offsets


def _shard_sort(keys, values, *, d: int, m: int, s_samples: int,
                sort_bits: int, axis_name: str, use_ragged: bool):
    """Per-shard body (runs under shard_map). keys/values: [m] local."""
    me = lax.axis_index(axis_name)
    mask = jnp.uint32(_SENTINEL if sort_bits >= 32
                      else (1 << sort_bits) - 1)
    has_values = values is not None
    exchange = _mk_exchange(use_ragged, axis_name, d)

    # -- 1. local stable sort ----------------------------------------
    mk = keys & mask
    pos = lax.iota(jnp.int32, m)
    ops = [mk, keys, pos] + ([values] if has_values else [])
    sorted_ops = lax.sort(ops, num_keys=1, is_stable=True)
    smk, sfull, spos = sorted_ops[0], sorted_ops[1], sorted_ops[2]
    svals = sorted_ops[3] if has_values else None

    # -- 2. splitters from regular samples ---------------------------
    samp_idx = jnp.array([(i + 1) * m // (s_samples + 1)
                          for i in range(s_samples)], jnp.int32)
    my_k = smk[samp_idx]
    my_p = spos[samp_idx]
    all_k = lax.all_gather(my_k, axis_name).reshape(-1)      # [D*S]
    all_p = lax.all_gather(my_p, axis_name).reshape(-1)
    all_s = jnp.repeat(jnp.arange(d, dtype=jnp.int32), s_samples)
    gk, gs, gp = lax.sort([all_k, all_s, all_p], num_keys=1, is_stable=True)
    spl_rank = jnp.array([(j + 1) * s_samples for j in range(d - 1)],
                         jnp.int32)
    spl_k, spl_s, spl_p = gk[spl_rank], gs[spl_rank], gp[spl_rank]

    # -- 3. destination shard per element (lex (key, shard, rank)) ---
    # dest = #splitters <= element; exact even for all-equal keys (skew).
    ek, es, ep = smk[None, :], me, spos[None, :]
    le = (spl_k[:, None] < ek) | (
        (spl_k[:, None] == ek) & (
            (spl_s[:, None] < es) | ((spl_s[:, None] == es)
                                     & (spl_p[:, None] <= ep))))
    dest = jnp.sum(le.astype(jnp.int32), axis=0)             # [m], monotone

    # -- 4. exchange plan --------------------------------------------
    send_sizes, input_offsets = _segment_layout(dest, d)
    c = lax.all_gather(send_sizes, axis_name)                # [D,D] c[i,j]
    # Offset of MY segment inside each receiver j's buffer = sum of what
    # lower-ranked shards send to j (keeps arrival order == stable order).
    prefix_c = jnp.cumsum(c, axis=0) - c                     # [D,D]
    send_out_off = prefix_c[me, :]                           # [D]
    recv_sizes = c[:, me]                                    # [D]
    recv_total = jnp.sum(recv_sizes)
    buf = 2 * m  # PSRS bound: max partition < 2m

    # -- exchange payloads -------------------------------------------
    r_full = exchange(sfull, send_sizes, input_offsets, send_out_off,
                      recv_sizes, buf, fill=_SENTINEL)
    r_vals = None
    if has_values:
        r_vals = exchange(svals, send_sizes, input_offsets, send_out_off,
                          recv_sizes, buf, fill=jnp.zeros((), svals.dtype))

    # -- 5. local stable merge (invalid-last, then masked key) -------
    slot = lax.iota(jnp.int32, buf)
    invalid = (slot >= recv_total).astype(jnp.uint32)
    ops2 = [invalid, r_full & mask, r_full] + (
        [r_vals] if has_values else [])
    merged = lax.sort(ops2, num_keys=2, is_stable=True)
    m_full = merged[2]
    m_vals = merged[3] if has_values else None

    # -- 6. exact rebalance to even [m] shards -----------------------
    tot_per_shard = jnp.sum(c, axis=0)                       # [D] recv totals
    g = jnp.cumsum(tot_per_shard) - tot_per_shard            # global starts
    my_g = g[me]
    k_idx = lax.iota(jnp.int32, buf)
    q = my_g + k_idx                                         # global position
    dest2 = jnp.where(k_idx < recv_total,
                      jnp.minimum(q // m, d - 1).astype(jnp.int32), d)
    send_sizes2, input_offsets2 = _segment_layout(dest2, d)
    # where my segment to shard j starts inside j's final [m] block:
    seg_start_q = my_g + input_offsets2
    send_out_off2 = jnp.clip(seg_start_q - jnp.arange(d) * m, 0, m)
    send_out_off2 = send_out_off2.astype(jnp.int32)
    c2 = lax.all_gather(send_sizes2, axis_name)              # [D,D]
    recv_sizes2 = c2[:, me]
    f_full = exchange(m_full, send_sizes2, input_offsets2, send_out_off2,
                      recv_sizes2, m, fill=_SENTINEL)
    if has_values:
        f_vals = exchange(m_vals, send_sizes2, input_offsets2, send_out_off2,
                          recv_sizes2, m, fill=jnp.zeros((), m_vals.dtype))
        return f_full, f_vals
    return f_full, f_full


def _dist_sort_impl(keys, values, sort_bits: int, mesh: Mesh,
                    use_ragged: bool, s_samples: int | None):
    d = mesh.shape[AXIS]
    if d == 1:
        # Degenerate mesh: the single-chip engine (keys already u32 here).
        from ..ops.sort_xla import sort_kv_xla, sort_xla
        if values is None:
            return sort_xla(keys, sort_bits)
        return sort_kv_xla(keys, values, sort_bits)
    n = keys.shape[0]
    m = cdiv(n, d)
    pad = d * m - n
    has_values = values is not None
    if pad:
        # Pads sort to the tail among max keys by stability (they hold the
        # highest original indices) — CHECK_BOUNDARY semantics
        # (RadixSortKeyValueKernels.cl:552-563) without a validity lane.
        keys = jnp.concatenate([keys, jnp.full((pad,), _SENTINEL, jnp.uint32)])
        if has_values:
            values = jnp.concatenate(
                [values, jnp.zeros((pad,), values.dtype)])
    # Sampling rate invariant for the 2m receive-buffer bound: either
    # s >= d (PSRS regular-sampling theorem: max partition < m + n/(d*s)
    # <= 2m), or s == m (every element sampled -> partitions are exactly
    # m). All branches below land in one of the two regimes.
    s = s_samples or max(d, min(64, m))
    s = min(s, m)

    fn = functools.partial(
        _shard_sort, d=d, m=m, s_samples=s, sort_bits=sort_bits,
        axis_name=AXIS, use_ragged=use_ragged)

    if has_values:
        body = lambda k, v: fn(k, v)
        in_specs = (P(AXIS), P(AXIS))
    else:
        body = lambda k: fn(k, None)
        in_specs = (P(AXIS),)

    mapped = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                           out_specs=(P(AXIS), P(AXIS)), check_vma=False)
    # Divisible n keeps the result evenly sharded on-device; ragged n must
    # gather to replicated before the unpad slice (uneven sharded slices are
    # unimplemented in XLA's sharding rules).
    out_spec = P(AXIS) if pad == 0 else P(None)
    out_sharding = NamedSharding(mesh, out_spec)

    def run(*args):
        out_k, out_v = mapped(*args)
        if pad:
            unshard = NamedSharding(mesh, P(None))
            out_k = jax.sharding.reshard(out_k, unshard)
            out_v = jax.sharding.reshard(out_v, unshard)
            out_k, out_v = out_k[:n], out_v[:n]
        return out_k, out_v

    args = (keys, values) if has_values else (keys,)
    out_k, out_v = jax.jit(
        run, out_shardings=(out_sharding, out_sharding))(*args)
    if has_values:
        return out_k, out_v
    return out_k


def _backend_supports_ragged() -> bool:
    return jax.default_backend() == "tpu"


def _validate(keys, sort_bits: int):
    """Same argument contract as the single-chip ``sortx.sort``
    (ops/sort.py): without this, partial sort_bits on i32/f32 keys would
    silently sort by low bits of the monotone u32 transform."""
    from ..ops.sort import _check_keys

    _check_keys(keys)
    if not (1 <= sort_bits <= 32):
        raise ValueError("sort_bits must be in 1..32")
    if keys.dtype != jnp.uint32 and sort_bits != 32:
        raise ValueError("partial sort_bits requires uint32 keys "
                         "(the reference's contract, Pprims.cpp:253)")


def dist_sort(keys, sort_bits: int = 32, *, mesh: Mesh | None = None,
              config: Config | None = None, use_ragged: bool | None = None):
    """Distributed stable LSD-equivalent sort over a device mesh.

    ``keys``: global 1D u32/i32/f32 array (sharded or unsharded). Returns
    the globally sorted array, evenly sharded over the mesh. Ordering is
    bit-identical to ``sortx.sort`` (and the reference's golden CPU sort).
    """
    from ..ops.sort import _to_radix_u32

    _validate(keys, sort_bits)
    mesh = mesh or make_sort_mesh()
    if use_ragged is None:
        use_ragged = _backend_supports_ragged()
    k, undo = _to_radix_u32(keys)
    out = _dist_sort_impl(k, None, sort_bits, mesh, use_ragged, None)
    return undo(out)


def dist_sort_kv(keys, values, sort_bits: int = 32, *,
                 mesh: Mesh | None = None, config: Config | None = None,
                 use_ragged: bool | None = None):
    """Distributed stable key-value sort (values follow keys)."""
    from ..ops.sort import _to_radix_u32

    _validate(keys, sort_bits)
    if values.shape != keys.shape:
        raise ValueError("keys and values must have the same shape")
    mesh = mesh or make_sort_mesh()
    if use_ragged is None:
        use_ragged = _backend_supports_ragged()
    k, undo = _to_radix_u32(keys)
    ks, vs = _dist_sort_impl(k, values, sort_bits, mesh, use_ragged, None)
    return undo(ks), vs
