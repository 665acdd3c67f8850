"""Group-by aggregation kernels.

The TPU-native successors of the reference's four aggregation hash tables
(storage/CollisionFreeVectorTable.hpp:55, PackedPayloadHashTable.hpp:70,
ThreadPrivateCompactKeyHashTable.hpp:51, HashTablePool.hpp:52):

- `dense_groupby` — the CollisionFreeVectorTable analog, a literal perfect fit for
  TPU: composite keys are radix-packed into a small integer domain and every aggregate
  becomes one masked scatter-add/min/max into a dense state array. Chosen by the
  planner when plan-time key ranges bound the domain (cost-model gate mirroring
  ExecutionGenerator::canUseCollisionFreeAggregation,
  query_optimizer/ExecutionGenerator.cpp:92-104).

- `sort_groupby` — the generic path (PackedPayload analog): lexsort rows by key
  columns, derive segment ids from boundaries, segment-reduce each aggregate. Fully
  static shapes; group count is a traced scalar; output rows [0, n_groups) are live.

All inputs are (columns, live-mask); aggregates skip masked rows and NULLs. Every
aggregate returns (data, non_null_count) — count 0 means the SQL result is NULL
(except COUNT itself).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from quickstep_tpu.ops.kernels import max_sentinel, min_sentinel

AggIn = Tuple[str, Optional[object], Optional[object]]  # (fn, vals, valid)


# ---------------------------------------------------------------------
# dense (collision-free) path
# ---------------------------------------------------------------------

def pack_dense_index(key_cols: List[jnp.ndarray], key_offsets: List[int],
                     key_strides: List[int], domain: int,
                     alive: jnp.ndarray) -> jnp.ndarray:
    """Radix-pack composite keys into [0, domain); dead/out-of-range rows -> domain
    (dropped by scatters)."""
    idx = jnp.zeros(alive.shape, dtype=jnp.int64)
    for col, off, stride in zip(key_cols, key_offsets, key_strides):
        idx = idx + (col.astype(jnp.int64) - off) * stride
    return jnp.where(alive & (idx >= 0) & (idx < domain), idx, domain)


def dense_groupby(idx: jnp.ndarray, domain: int, agg_specs: List[AggIn],
                  alive: jnp.ndarray):
    """Collision-free aggregation: idx from pack_dense_index. Returns
    (occupied bool[domain], [(data[domain], nn_count[domain])...])."""
    in_dom = idx < domain
    results = []
    for fn, vals, valid in agg_specs:
        live = alive & in_dom if valid is None else (alive & in_dom & valid)
        nn = jnp.zeros((domain,), jnp.int64).at[idx].add(
            live.astype(jnp.int64), mode="drop")
        if fn == "count":
            data = nn
        elif fn in ("sum", "avg"):
            contrib = jnp.where(live, vals, jnp.zeros((), vals.dtype))
            acc = jnp.zeros((domain,), contrib.dtype).at[idx].add(
                contrib, mode="drop")
            data = acc if fn == "sum" else \
                acc.astype(jnp.float64) / jnp.maximum(nn, 1)
        elif fn == "min":
            contrib = jnp.where(live, vals, max_sentinel(vals.dtype))
            data = jnp.full((domain,), max_sentinel(vals.dtype),
                            contrib.dtype).at[idx].min(contrib, mode="drop")
        elif fn == "max":
            contrib = jnp.where(live, vals, min_sentinel(vals.dtype))
            data = jnp.full((domain,), min_sentinel(vals.dtype),
                            contrib.dtype).at[idx].max(contrib, mode="drop")
        else:
            raise ValueError(fn)
        results.append((data, nn))
    occupied = jnp.zeros((domain,), bool).at[idx].set(True, mode="drop")
    return occupied, results


# ---------------------------------------------------------------------
# generic sort-based path
# ---------------------------------------------------------------------

def sort_groupby(key_cols: List[jnp.ndarray],
                 key_valids: List[Optional[jnp.ndarray]],
                 agg_specs: List[AggIn],
                 alive: jnp.ndarray):
    """Sort-based group-by.

    Returns (out_key_cols, out_key_valids, n_groups, [(data, nn_count)...]).
    Output arrays have input capacity; rows [0, n_groups) are live.
    """
    capacity = alive.shape[0]
    sort_keys = []
    for col, valid in zip(key_cols, key_valids):
        k = col
        if valid is not None:
            # NULL group keys group together at the max sentinel
            k = jnp.where(valid, col, max_sentinel(col.dtype))
        sort_keys.append(k)
    # lexsort: last key is primary; dead rows last via aliveness as the primary key
    order = jnp.lexsort(tuple(reversed(sort_keys)) + ((~alive).astype(jnp.int8),))
    s_alive = alive[order]
    s_keys = [k[order] for k in sort_keys]
    idx = jnp.arange(capacity)
    change = (idx == 0)
    for k in s_keys:
        change = change | (k != jnp.roll(k, 1))
    change = change & s_alive
    seg_ids = jnp.cumsum(change.astype(jnp.int32)) - 1
    seg_ids = jnp.where(s_alive, seg_ids, capacity)  # dead rows drop
    n_groups = jnp.sum(change.astype(jnp.int32))

    results = []
    for fn, vals, valid in agg_specs:
        sv = vals[order] if vals is not None else None
        svalid = valid[order] if valid is not None else None
        live = s_alive if svalid is None else (s_alive & svalid)
        nn = jax.ops.segment_sum(live.astype(jnp.int64), seg_ids,
                                 num_segments=capacity)
        if fn == "count":
            data = nn
        elif fn in ("sum", "avg"):
            contrib = jnp.where(live, sv, jnp.zeros((), sv.dtype))
            acc = jax.ops.segment_sum(contrib, seg_ids, num_segments=capacity)
            data = acc if fn == "sum" else \
                acc.astype(jnp.float64) / jnp.maximum(nn, 1)
        elif fn == "min":
            contrib = jnp.where(live, sv, max_sentinel(sv.dtype))
            data = jax.ops.segment_min(contrib, seg_ids, num_segments=capacity)
        elif fn == "max":
            contrib = jnp.where(live, sv, min_sentinel(sv.dtype))
            data = jax.ops.segment_max(contrib, seg_ids, num_segments=capacity)
        else:
            raise ValueError(fn)
        results.append((data, nn))

    # Group keys: first row of each segment, compacted to the front.
    dest = jnp.where(change, seg_ids, capacity)
    out_keys = []
    out_valids = []
    for col, valid in zip(key_cols, key_valids):
        sc = col[order]
        out_keys.append(jnp.zeros((capacity,), sc.dtype).at[dest].set(
            sc, mode="drop"))
        if valid is not None:
            sv = valid[order]
            out_valids.append(jnp.zeros((capacity,), bool).at[dest].set(
                sv, mode="drop"))
        else:
            out_valids.append(None)
    return out_keys, out_valids, n_groups, results


# ---------------------------------------------------------------------
# scalar (no group-by) aggregation — reference's single-state path
# (AggregationOperationState.hpp:223 aggregateBlockSingleState)
# ---------------------------------------------------------------------

def scalar_agg(fn: str, vals: Optional[jnp.ndarray],
               valid: Optional[jnp.ndarray], alive: jnp.ndarray):
    """Returns (result_scalar, non_null_count)."""
    live = alive if valid is None else (alive & valid)
    count = jnp.sum(live.astype(jnp.int64))
    if fn == "count":
        return count, count
    if fn in ("sum", "avg"):
        contrib = jnp.where(live, vals, jnp.zeros((), vals.dtype))
        s = jnp.sum(contrib)
        if fn == "sum":
            return s, count
        return s.astype(jnp.float64) / jnp.maximum(count, 1), count
    if fn == "min":
        return jnp.min(jnp.where(live, vals, max_sentinel(vals.dtype))), count
    if fn == "max":
        return jnp.max(jnp.where(live, vals, min_sentinel(vals.dtype))), count
    raise ValueError(fn)


def distinct_count(vals: jnp.ndarray, valid: Optional[jnp.ndarray],
                   alive: jnp.ndarray):
    """COUNT(DISTINCT x) without grouping: sort + boundary count."""
    live = alive if valid is None else (alive & valid)
    capacity = vals.shape[0]
    # Dead rows sort to the max sentinel; the first n_live sorted entries are the
    # live values (exact unless live data actually contains the sentinel value).
    k = jnp.where(live, vals, max_sentinel(vals.dtype))
    s = jnp.sort(k)
    n_live = jnp.sum(live.astype(jnp.int32))
    idx = jnp.arange(capacity)
    boundary = (idx == 0) | (s != jnp.roll(s, 1))
    return jnp.sum((boundary & (idx < n_live)).astype(jnp.int64))
