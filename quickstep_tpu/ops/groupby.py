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


# Below this domain size, aggregate via broadcast-compare reductions (D full
# passes on the VPU) instead of scatters: TPU lowers colliding scatter-adds to a
# slow serialized path, while D x N elementwise work vectorizes perfectly.
BROADCAST_DOMAIN_LIMIT = 128


def dense_groupby(idx: jnp.ndarray, domain: int, agg_specs: List[AggIn],
                  alive: jnp.ndarray):
    """Collision-free aggregation: idx from pack_dense_index. Returns
    (occupied bool[domain], [(data[domain], nn_count[domain])...])."""
    if domain <= BROADCAST_DOMAIN_LIMIT:
        return _dense_groupby_broadcast(idx, domain, agg_specs, alive)
    return _dense_groupby_scatter(idx, domain, agg_specs, alive)


def _dense_groupby_broadcast(idx, domain: int, agg_specs: List[AggIn],
                             alive: jnp.ndarray):
    """One-hot membership (domain, n) + per-group masked reductions — zero
    scatters, the TPU-native CollisionFreeVectorTable."""
    in_dom = idx < domain
    onehot = (idx[None, :] == jnp.arange(domain, dtype=idx.dtype)[:, None])
    results = []
    nn_cache = {}
    for fn, vals, valid in agg_specs:
        live = alive & in_dom if valid is None else (alive & in_dom & valid)
        key = id(valid)
        if key not in nn_cache:
            nn_cache[key] = jnp.sum(onehot & live[None, :], axis=1,
                                    dtype=jnp.int64)
        nn = nn_cache[key]
        if fn == "count":
            data = nn
        elif fn in ("sum", "avg"):
            contrib = jnp.where(live, vals, jnp.zeros((), vals.dtype))
            acc = jnp.sum(jnp.where(onehot, contrib[None, :],
                                    jnp.zeros((), contrib.dtype)), axis=1)
            data = acc if fn == "sum" else \
                acc.astype(jnp.float64) / jnp.maximum(nn, 1)
        elif fn == "min":
            contrib = jnp.where(live, vals, max_sentinel(vals.dtype))
            data = jnp.min(jnp.where(onehot, contrib[None, :],
                                     max_sentinel(vals.dtype)), axis=1)
        elif fn == "max":
            contrib = jnp.where(live, vals, min_sentinel(vals.dtype))
            data = jnp.max(jnp.where(onehot, contrib[None, :],
                                     min_sentinel(vals.dtype)), axis=1)
        else:
            raise ValueError(fn)
        results.append((data, nn))
    occupied = jnp.any(onehot & alive[None, :] & in_dom[None, :], axis=1)
    return occupied, results


def _dense_groupby_scatter(idx, domain: int, agg_specs: List[AggIn],
                           alive: jnp.ndarray):
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
                 alive: jnp.ndarray,
                 packed_key: Optional[jnp.ndarray] = None,
                 sort_subset: Optional[List[int]] = None):
    """Sort-based group-by, scatter-collision-free.

    TPU-shaped: after the lexsort, every segment is a contiguous run, so sums
    and counts come from cumsum differences at run boundaries and min/max from
    a segmented inclusive scan — no colliding scatters anywhere (TPU lowers
    those to a serial path). The only scatters are boundary compactions with
    unique indices.

    Returns (out_key_cols, out_key_valids, n_groups, [(data, nn_count)...]).
    Output arrays have input capacity; rows [0, n_groups) are live.
    """
    capacity = alive.shape[0]
    if packed_key is not None:
        # planner-provided injective integer packing of the composite key:
        # single-operand sort (TPU sort compile time scales badly with operands)
        sort_keys = [packed_key]
    else:
        # sort_subset: a minimal key cover (ReduceGroupByAttributes analog) —
        # functionally-dependent keys need not participate in the sort; their
        # values are gathered from each segment's first row like any other key.
        subset = sort_subset if sort_subset is not None \
            else range(len(key_cols))
        sort_keys = []
        for i in subset:
            col, valid = key_cols[i], key_valids[i]
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
    seg_ids = jnp.cumsum(change.astype(jnp.int32)) - 1  # valid where s_alive
    n_groups = jnp.sum(change.astype(jnp.int32))
    n_live = jnp.sum(s_alive.astype(jnp.int32))

    # first sorted index of each segment, compacted to [0, n_groups)
    # (unique destination indices -> fast scatter path)
    dest = jnp.where(change, seg_ids, capacity)
    first_idx = jnp.zeros((capacity,), jnp.int32).at[dest].set(
        idx.astype(jnp.int32), mode="drop", unique_indices=True)
    gidx = jnp.arange(capacity)
    # last sorted index of segment g = first_idx[g+1]-1, or n_live-1 for the last
    next_first = jnp.where(gidx + 1 < n_groups,
                           first_idx[jnp.clip(gidx + 1, 0, capacity - 1)],
                           n_live)
    last_idx = next_first - 1
    valid_g = gidx < n_groups
    safe_first = jnp.clip(first_idx, 0, capacity - 1)
    safe_last = jnp.clip(last_idx, 0, capacity - 1)

    def run_sum(contrib):
        p = jnp.cumsum(contrib)
        total = p[safe_last]
        below = jnp.where(first_idx > 0,
                          p[jnp.clip(first_idx - 1, 0, capacity - 1)],
                          jnp.zeros((), contrib.dtype))
        return jnp.where(valid_g, total - below, jnp.zeros((), contrib.dtype))

    def seg_scan(contrib, combine):
        def op(a, b):
            av, af = a
            bv, bf = b
            return jnp.where(bf, bv, combine(av, bv)), af | bf
        out, _ = jax.lax.associative_scan(op, (contrib, change))
        return out

    results = []
    for fn, vals, valid in agg_specs:
        sv = vals[order] if vals is not None else None
        svalid = valid[order] if valid is not None else None
        live = s_alive if svalid is None else (s_alive & svalid)
        nn = run_sum(live.astype(jnp.int64))
        if fn == "count":
            data = nn
        elif fn in ("sum", "avg"):
            contrib = jnp.where(live, sv, jnp.zeros((), sv.dtype))
            acc = run_sum(contrib)
            data = acc if fn == "sum" else \
                acc.astype(jnp.float64) / jnp.maximum(nn, 1)
        elif fn == "min":
            contrib = jnp.where(live, sv, max_sentinel(sv.dtype))
            data = seg_scan(contrib, jnp.minimum)[safe_last]
        elif fn == "max":
            contrib = jnp.where(live, sv, min_sentinel(sv.dtype))
            data = seg_scan(contrib, jnp.maximum)[safe_last]
        else:
            raise ValueError(fn)
        results.append((data, nn))

    # Group keys: first row of each segment, gathered to the front.
    out_keys = []
    out_valids = []
    for col, valid in zip(key_cols, key_valids):
        sc = col[order]
        out_keys.append(sc[safe_first])
        if valid is not None:
            out_valids.append(valid[order][safe_first] & valid_g)
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
