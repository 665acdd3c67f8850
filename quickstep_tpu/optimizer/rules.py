"""Physical optimization rules over the logical plan.

Round-1 subset of the reference's physical rule pipeline
(query_optimizer/PhysicalGenerator.cpp:137-215):

- `prune_columns`    — PruneColumns: TableScans emit only attrs the plan consumes.
- `reorder_joins`    — StarSchemaHashJoinOrderOptimization + SwapProbeBuild
  (rules/StarSchemaHashJoinOrderOptimization.hpp:53): flatten maximal inner
  equi-join trees, greedily re-join components smallest-estimated-output-first, and
  orient each join so the build (right) side has unique keys / smaller cardinality.

The cost model mirrors cost_model/StarSchemaSimpleCostModel.hpp:58: cardinalities
from catalog stats, selectivity heuristics per predicate shape, join cardinality
|L|*|R| / max(ndv(keys)).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from quickstep_tpu.config import Config
from quickstep_tpu.expressions.scalar import (
    Expr, Attr, Lit, Cmp, Logical, Not, InSet, DictBitmapProbe, IsNull, Case,
)
from quickstep_tpu.optimizer import logical as L


# =====================================================================
# attribute statistics environment
# =====================================================================

@dataclasses.dataclass
class AttrStats:
    ndv: Optional[float] = None
    n: Optional[float] = None
    lo: Optional[float] = None    # column min (device encoding)
    hi: Optional[float] = None    # column max


def collect_attr_stats(plan: L.LogicalNode, db) -> Dict[int, AttrStats]:
    env: Dict[int, AttrStats] = {}

    def walk(node):
        if isinstance(node, L.TableScan):
            rel = db.get_relation(node.relation_name)
            st = rel.statistics if rel is not None else None
            n = rel.num_tuples if rel is not None else None
            for a in node.attrs:
                ndv = lo = hi = None
                if st is not None and st.exact:
                    ndv = st.num_distinct.get(a.name)
                    mn = st.min_values.get(a.name)
                    mx = st.max_values.get(a.name)
                    if isinstance(mn, (int, float)) and \
                            isinstance(mx, (int, float)):
                        lo, hi = float(mn), float(mx)
                env[a.expr_id] = AttrStats(ndv=ndv, n=n, lo=lo, hi=hi)
        if isinstance(node, L.SharedSubplan):
            walk(node.plan)
            for fresh, orig in zip(node.attrs, node.plan.output):
                if orig.expr_id in env:
                    env[fresh.expr_id] = env[orig.expr_id]
        if isinstance(node, L.Aggregate):
            for a, ge in zip(node.group_attrs, node.group_by):
                if isinstance(ge, Attr) and ge.expr_id in env:
                    env[a.expr_id] = env[ge.expr_id]
        if isinstance(node, L.Project):
            for a, e in zip(node.attrs, node.exprs):
                if isinstance(e, Attr) and e.expr_id in env:
                    env[a.expr_id] = env[e.expr_id]
        for c in node.children():
            walk(c)
    walk(plan)
    return env


# =====================================================================
# selectivity / cardinality estimation
# =====================================================================

def estimate_selectivity(pred: Optional[Expr],
                         env: Dict[int, AttrStats]) -> float:
    if pred is None:
        return 1.0
    if isinstance(pred, Logical):
        if pred.op == "AND":
            return _and_selectivity(pred.operands, env)
        s = 0.0
        for o in pred.operands:
            s += estimate_selectivity(o, env)
        return min(1.0, s)
    if isinstance(pred, Not):
        return max(0.0, 1.0 - estimate_selectivity(pred.operand, env))
    if isinstance(pred, Cmp):
        if pred.op == "=":
            for side in (pred.lhs, pred.rhs):
                if isinstance(side, Attr):
                    st = env.get(side.expr_id)
                    if st and st.ndv:
                        return 1.0 / max(st.ndv, 1.0)
            return 0.1
        if pred.op == "<>":
            return 0.9
        # range comparison vs a literal: interpolate within [min, max]
        # (DATE codes are order-preserving, so this covers date windows too)
        attr, lit, op = None, None, pred.op
        if isinstance(pred.lhs, Attr) and isinstance(pred.rhs, Lit):
            attr, lit = pred.lhs, pred.rhs
        elif isinstance(pred.rhs, Attr) and isinstance(pred.lhs, Lit):
            attr, lit = pred.rhs, pred.lhs
            op = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}[op]
        if attr is not None and isinstance(lit.value, (int, float)):
            st = env.get(attr.expr_id)
            if st and st.lo is not None and st.hi is not None and \
                    st.hi > st.lo:
                frac = (float(lit.value) - st.lo) / (st.hi - st.lo)
                frac = min(max(frac, 0.0), 1.0)
                if op in (">", ">="):
                    frac = 1.0 - frac
                return min(max(frac, 0.001), 1.0)
        return 0.3
    if isinstance(pred, DictBitmapProbe):
        bm = np.asarray(pred.bitmap)
        frac = float(bm.mean()) if bm.size else 0.0
        return (1.0 - frac) if pred.negated else frac
    if isinstance(pred, InSet):
        base = min(1.0, 0.1 * max(len(pred.values), 1))
        return (1.0 - base) if pred.negated else base
    if isinstance(pred, IsNull):
        return 0.1 if not pred.negated else 0.9
    if isinstance(pred, Lit):
        if pred.value in (0, None):
            return 0.0
        return 1.0
    return 0.5


def _unique_build_base_rows(node, right_keys, db):
    """If the build subtree is Filter/Project over a TableScan whose relation
    is unique on the join-key columns (single unique column or a recorded
    unique pair), return the base relation's row count; else None."""
    while isinstance(node, (L.Filter, L.Project)):
        node = node.input
    if not isinstance(node, L.TableScan):
        return None
    rel = db.get_relation(node.relation_name)
    if rel is None:
        return None
    by_id = {a.expr_id: a.name for a in node.attrs}
    names = []
    for k in right_keys:
        if not isinstance(k, Attr) or k.expr_id not in by_id:
            return None
        names.append(by_id[k.expr_id])
    st = rel.statistics
    for name in names:
        attr = rel.attribute_by_name(name)
        if attr is not None and attr.unique:
            return float(rel.num_tuples)
        if st is not None and st.exact and st.num_tuples and \
                st.num_distinct.get(name) == st.num_tuples:
            return float(rel.num_tuples)
    if st is not None and st.exact and len(names) >= 2:
        key = set(names)
        for pair in getattr(st, "unique_pairs", []):
            if set(pair) <= key:
                return float(rel.num_tuples)
    return None


def _range_conjunct(pred):
    """(attr_id, op, value) for a range comparison vs a numeric literal."""
    if not isinstance(pred, Cmp) or pred.op in ("=", "<>"):
        return None
    if isinstance(pred.lhs, Attr) and isinstance(pred.rhs, Lit):
        attr, lit, op = pred.lhs, pred.rhs, pred.op
    elif isinstance(pred.rhs, Attr) and isinstance(pred.lhs, Lit):
        attr, lit = pred.rhs, pred.lhs
        op = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}[pred.op]
    else:
        return None
    if not isinstance(lit.value, (int, float)):
        return None
    return attr.expr_id, op, float(lit.value)


def _and_selectivity(operands, env) -> float:
    """AND selectivity with per-attribute interval intersection: a window
    like `d >= a AND d < b` estimates as (b-a)/(hi-lo), not as the product of
    two one-sided fractions (which wildly over-estimates narrow windows)."""
    intervals: Dict[int, List[float]] = {}
    others = []
    for o in operands:
        r = _range_conjunct(o)
        if r is not None:
            attr_id, op, v = r
            st = env.get(attr_id)
            if st and st.lo is not None and st.hi is not None and \
                    st.hi > st.lo:
                lb, ub = intervals.setdefault(attr_id, [st.lo, st.hi])
                if op in ("<", "<="):
                    intervals[attr_id][1] = min(ub, v)
                else:
                    intervals[attr_id][0] = max(lb, v)
                continue
        others.append(o)
    s = 1.0
    for attr_id, (lb, ub) in intervals.items():
        st = env[attr_id]
        frac = (ub - lb) / (st.hi - st.lo)
        s *= min(max(frac, 0.001), 1.0)
    for o in others:
        s *= estimate_selectivity(o, env)
    return s


def estimate_cardinality(plan: L.LogicalNode, db,
                         env: Dict[int, AttrStats]) -> float:
    if isinstance(plan, L.TableScan):
        rel = db.get_relation(plan.relation_name)
        return float(rel.num_tuples) if rel is not None else 1000.0
    if isinstance(plan, L.Generator):
        return float(max(1, (plan.end - plan.start) // max(plan.step, 1) + 1))
    if isinstance(plan, L.Filter):
        return estimate_cardinality(plan.input, db, env) * \
            estimate_selectivity(plan.predicate, env)
    if isinstance(plan, L.Project):
        return estimate_cardinality(plan.input, db, env)
    if isinstance(plan, L.SharedSubplan):
        return estimate_cardinality(plan.plan, db, env)
    if isinstance(plan, L.Aggregate):
        cin = estimate_cardinality(plan.input, db, env)
        if not plan.group_by:
            return 1.0
        g = 1.0
        for ge in plan.group_by:
            if isinstance(ge, Attr):
                st = env.get(ge.expr_id)
                g *= (st.ndv if st and st.ndv else 100.0)
            else:
                g *= 100.0
        return min(cin, g)
    if isinstance(plan, L.Join):
        cl = estimate_cardinality(plan.left, db, env)
        cr = estimate_cardinality(plan.right, db, env)
        if plan.kind == "cross":
            return cl * cr
        if plan.kind in ("semi", "anti"):
            # coverage model: the build side hits at most cr of the probe
            # key's ndv distinct values, so a semi keeps ~cl * cr/ndv rows.
            # anti stays at the conservative 0.5 (its output is driven by
            # residuals/key coverage in ways the stats can't see, and an
            # under-estimate costs a compaction-overflow retry).
            ndv = 1.0
            for lk in plan.left_keys:
                if isinstance(lk, Attr):
                    st = env.get(lk.expr_id)
                    if st and st.ndv:
                        ndv = max(ndv, st.ndv)
            if plan.kind == "semi" and ndv > 1.0:
                return max(1.0, cl * min(1.0, cr / ndv))
            return cl * 0.5
        # FK-style joins: when the build side is UNIQUE on the join keys
        # (PK), each probe row matches at most once, and under containment
        # the match rate is the fraction of the build relation retained by
        # its filters — out = cl * cr / |base|. The generic
        # product-of-per-key-ndv divisor catastrophically over-divides
        # composite keys (ndv(a)*ndv(b) >> ndv(a,b) for a composite PK).
        ub = _unique_build_base_rows(plan.right, plan.right_keys, db)
        if ub is not None and ub > 0:
            out = cl * min(1.0, cr / ub)
        else:
            ndv = 1.0
            for lk, rk in zip(plan.left_keys, plan.right_keys):
                d = 1.0
                for side in (lk, rk):
                    if isinstance(side, Attr):
                        st = env.get(side.expr_id)
                        if st and st.ndv:
                            d = max(d, st.ndv)
                ndv *= max(d, 1.0)
            # a composite key's ndv cannot exceed either side's row count
            ndv = min(ndv, max(cl, cr, 1.0))
            out = cl * cr / max(ndv, 1.0)
        if plan.kind == "left":
            out = max(out, cl)
        return max(out, 1.0)
    if isinstance(plan, (L.Sort, L.Distinct)):
        c = estimate_cardinality(plan.input, db, env)
        lim = getattr(plan, "limit", None)
        return min(c, lim) if lim else c
    if isinstance(plan, L.Limit):
        return float(plan.limit)
    if isinstance(plan, L.SetOperation):
        return sum(estimate_cardinality(c, db, env) for c in plan.inputs)
    if hasattr(plan, "input"):
        return estimate_cardinality(plan.input, db, env)
    return 1000.0


# =====================================================================
# uniqueness analysis (static): is `keys` unique on `plan`?
# =====================================================================

def keys_unique(plan: L.LogicalNode, keys: List[Expr], db) -> bool:
    ids = [k.expr_id for k in keys if isinstance(k, Attr)]
    if len(ids) != len(keys):
        return False
    return _unique_sets(plan, db) and any(
        s <= frozenset(ids) for s in _unique_sets(plan, db))


def _unique_sets(plan: L.LogicalNode, db) -> List[frozenset]:
    if isinstance(plan, L.TableScan):
        rel = db.get_relation(plan.relation_name)
        out = []
        if rel is None:
            return out
        st = rel.statistics
        for a_cat in rel.attributes:
            declared = a_cat.unique
            stat_unique = (st.exact and st.num_tuples and
                           st.num_distinct.get(a_cat.name) == st.num_tuples)
            if declared or stat_unique:
                for a in plan.attrs:
                    if a.name == a_cat.name:
                        out.append(frozenset([a.expr_id]))
        if st.exact:
            by_name = {a.name: a.expr_id for a in plan.attrs}
            for pair in st.unique_pairs:
                if all(p in by_name for p in pair):
                    out.append(frozenset(by_name[p] for p in pair))
        return out
    if isinstance(plan, L.Filter):
        return _unique_sets(plan.input, db)
    if isinstance(plan, L.Project):
        inner = _unique_sets(plan.input, db)
        passthru = {e.expr_id: a.expr_id for e, a in zip(plan.exprs, plan.attrs)
                    if isinstance(e, Attr)}
        return [frozenset(passthru[i] for i in s) for s in inner
                if all(i in passthru for i in s)]
    if isinstance(plan, L.Aggregate):
        return [frozenset(a.expr_id for a in plan.group_attrs)]
    if isinstance(plan, L.Distinct):
        return [frozenset(a.expr_id for a in plan.output)]
    if isinstance(plan, L.SharedSubplan):
        inner = _unique_sets(plan.plan, db)
        remap = {o.expr_id: f.expr_id
                 for f, o in zip(plan.attrs, plan.plan.output)}
        return [frozenset(remap[i] for i in s) for s in inner
                if all(i in remap for i in s)]
    if isinstance(plan, L.Join):
        # probe-side keys stay unique when the build side is unique on the
        # join keys (each probe row appears at most once); symmetrically, in
        # an INNER join whose probe side is unique on its keys, each build
        # row appears at most once, so build-side unique sets survive too
        # (Q18: o_orderkey stays unique through customer⋈orders).
        if plan.kind in ("semi", "anti"):
            return _unique_sets(plan.left, db)
        out = []
        if plan.kind in ("inner", "left") and \
                keys_unique(plan.right, plan.right_keys, db):
            out.extend(_unique_sets(plan.left, db))
        if plan.kind == "inner" and \
                keys_unique(plan.left, plan.left_keys, db):
            out.extend(_unique_sets(plan.right, db))
        return out
    if isinstance(plan, (L.Sort, L.Limit)):
        return _unique_sets(plan.input, db)
    return []


# =====================================================================
# rules
# =====================================================================

def optimize_plan(plan: L.LogicalNode, config: Config, db) -> L.LogicalNode:
    env = collect_attr_stats(plan, db)
    plan = _push_semi_into_aggregates(plan, db, env)
    plan = _push_semi_to_leaves(plan, db, env)
    plan = _eager_aggregate_pushdown(plan, db, env)
    if config.reorder_hash_joins:
        plan = _reorder_joins(plan, db, env)
    plan = _order_conjuncts(plan, env)
    plan = _prune_columns(plan)
    plan = _share_common_subplans(plan)
    _annotate_join_estimates(plan, db, env)
    return plan


def _share_common_subplans(plan):
    """ExtractCommonSubexpression at plan granularity (the reference extracts
    shared scalar subexpressions, query_optimizer/rules/
    ExtractCommonSubexpression; here whole repeated Aggregate/Distinct
    subtrees — e.g. Q18 after eager aggregation computes
    Aggregate(lineitem BY l_orderkey) once for its HAVING subquery and once
    as the eager partial). Structurally identical subtrees (expr_ids
    canonicalized by the compile-cache fingerprint) are wrapped in
    SharedSubplan nodes pointing at ONE plan object; the runner memoizes on
    that object so the subtree executes once. XLA does NOT CSE large sorts
    across identical subgraphs — this must happen at plan level."""
    from quickstep_tpu.exec.executor import _fingerprint, _node_exprs
    from quickstep_tpu.expressions.subquery import SubqueryScalar
    counts: dict = {}
    first: dict = {}

    def each_subplan(node, fn):
        # subquery plans execute in the SAME runner (_bind_subqueries ->
        # _exec_memo), so they participate in sharing — e.g. Q11's HAVING
        # subquery repeats the outer partsupp⋈supplier⋈nation join verbatim
        for e in _node_exprs(node):
            stack = [e]
            while stack:
                x = stack.pop()
                if isinstance(x, SubqueryScalar):
                    fn(x)
                stack.extend(x.children())

    def scan(node):
        if isinstance(node, (L.Aggregate, L.Distinct, L.Join)):
            fp = _fingerprint(node)
            counts[fp] = counts.get(fp, 0) + 1
            first.setdefault(fp, node)
        for c in node.children():
            scan(c)
        each_subplan(node, lambda x: scan(x.plan))
    scan(plan)
    shared = {fp for fp, c in counts.items() if c >= 2}
    if not shared:
        return plan
    names = {fp: f"__cse_{i}"
             for i, fp in enumerate(fp for fp in counts if fp in shared)}

    def rewrite(node):
        if isinstance(node, (L.Aggregate, L.Distinct, L.Join)):
            fp = _fingerprint(node)
            if fp in shared:
                # every occurrence (including the first) is wrapped, so all
                # consumers reach the one plan object through the runner's
                # memo — the first's attr map is the identity
                return L.SharedSubplan(
                    name=names[fp], plan=first[fp],
                    attrs=[dataclasses.replace(a) for a in node.output])
        node = _recurse_children(node, rewrite)
        each_subplan(node, lambda x: setattr(x, "plan", rewrite(x.plan)))
        return node
    return rewrite(plan)


# ---- semi-join derivation / placement ----
#
# Together these two rewrites are the plan-level counterpart of the
# reference's LIP-filter push (utility/lip_filter/LIPFilterGenerator.cpp
# attaches bloom filters built from a selective join side to scans far below
# the join): instead of runtime bloom probes, the planner inserts explicit
# semi joins where they cut the most work, and the estimate-driven pre-join
# compaction then runs every downstream operator at the filtered size.

def _recurse_children(node, fn):
    for f in dataclasses.fields(node) if dataclasses.is_dataclass(node) else []:
        v = getattr(node, f.name)
        if isinstance(v, L.LogicalNode):
            setattr(node, f.name, fn(v))
        elif isinstance(v, list) and v and isinstance(v[0], L.LogicalNode):
            setattr(node, f.name, [fn(x) for x in v])
    return node


def _selective_source(n: L.LogicalNode, ids: set):
    """Deepest restricted subtree of `n` (a Filter or semi/anti join) whose
    output still covers the attr ids — the candidate build side for a derived
    semi filter. Bare scans are never selective; unknown node kinds stop the
    walk."""
    if not ids or not ids <= {a.expr_id for a in n.output}:
        return None
    if isinstance(n, L.Filter):
        return n
    if isinstance(n, L.Project):
        return _selective_source(n.input, ids)
    if isinstance(n, L.Join):
        if n.kind in ("semi", "anti"):
            return n
        if n.kind == "inner":
            return (_selective_source(n.left, ids) or
                    _selective_source(n.right, ids))
        if n.kind == "left":
            return _selective_source(n.left, ids)
    return None


def _push_semi_into_aggregates(node, db, env):
    """Magic-set style rewrite for the decorrelated-subquery shape (Q17, Q2,
    Q20): Join[X ⋈ Aggregate(group k)] where X's join key originates from a
    selective subtree S. The aggregate then only needs groups whose key
    appears in S, so a semi join against S (re-used, not recomputed — the
    runner memoizes shared nodes) is inserted under the Aggregate. Correct
    because the semi filter removes whole groups (every row of a group
    shares the group key), never rows within a surviving group, and removed
    groups could not have joined: every X key value flows from S's output."""
    node = _recurse_children(node, lambda c: _push_semi_into_aggregates(
        c, db, env))
    if not (isinstance(node, L.Join) and node.left_keys and
            node.kind in ("inner", "left", "semi") and not node.null_aware):
        return node
    wrappers = []
    w = node.right
    while isinstance(w, L.Filter):
        wrappers.append(w)
        w = w.input
    if not isinstance(w, L.Aggregate) or not w.group_by:
        return node
    gmap = {a.expr_id: e for a, e in zip(w.group_attrs, w.group_by)}
    pairs = []   # (group_by expr on agg input, source key expr)
    src_ids: set = set()
    for lk, rk in zip(node.left_keys, node.right_keys):
        if (isinstance(rk, Attr) and rk.expr_id in gmap and
                isinstance(gmap[rk.expr_id], Attr) and
                isinstance(lk, Attr)):
            pairs.append((gmap[rk.expr_id], lk))
            src_ids.add(lk.expr_id)
    if not pairs:
        return node
    chain = _selective_source(node.left, src_ids)
    if chain is None:
        return node
    try:
        if estimate_cardinality(chain, db, env) > \
                0.2 * estimate_cardinality(w.input, db, env):
            return node
    except Exception:
        return node
    semi = L.Join(left=w.input, right=chain, kind="semi",
                  left_keys=[p[0] for p in pairs],
                  right_keys=[p[1] for p in pairs])
    new_right = dataclasses.replace(w, input=semi)
    for f in reversed(wrappers):
        new_right = dataclasses.replace(f, input=new_right)
    return dataclasses.replace(node, right=new_right)


def _eager_aggregate_pushdown(node, db, env):
    """Eager aggregation (Yan & Larson): Aggregate over a PK-FK join whose
    group keys contain a unique key of the probe side and whose aggregate
    args all come from the build side becomes

        Project( Join(L, Aggregate(R group by fk)) )

    — the Q13 shape. The expansion join at |L| x K capacity and the group-by
    over it collapse into one |R|-row aggregate plus a unique join at |L|.
    Each group is exactly one L row (group keys unique on L), so the pushed
    per-fk partial IS the final aggregate; LEFT-join NULL partials restore
    the empty-group semantics (COUNT wrapped to 0, SUM/MIN/MAX/AVG stay
    NULL). The reference has no counterpart; its Q13 runs the join first
    (relational_operators/HashJoinOperator + AggregationOperator)."""
    node = _recurse_children(node, lambda c: _eager_aggregate_pushdown(
        c, db, env))
    if not (isinstance(node, L.Aggregate) and node.group_by and
            isinstance(node.input, L.Join)):
        return node
    j = node.input
    if j.kind not in ("inner", "left") or not j.left_keys or j.null_aware:
        return node
    mirrored = _eager_aggregate_mirror(node, j, db, env)
    if mirrored is not None:
        return mirrored
    left_ids = {a.expr_id for a in j.left.output}
    right_ids = {a.expr_id for a in j.right.output}
    if j.residual is not None:
        # an R-only ON-residual (Q13's o_comment NOT LIKE) is equivalent to
        # pre-filtering R: failing rows simply never match, for LEFT and
        # INNER alike
        if not j.residual.referenced_attrs() <= right_ids:
            return node
        j = dataclasses.replace(j, right=L.Filter(input=j.right,
                                                  predicate=j.residual),
                                residual=None)
    for ge in node.group_by:
        if not (isinstance(ge, Attr) and ge.expr_id in left_ids):
            return node
    if not keys_unique(j.left, list(node.group_by), db):
        return node
    for s in node.aggregates:
        if s.distinct or s.fn not in ("count", "sum", "min", "max", "avg"):
            return node
        if s.arg is None:   # COUNT(*) counts the NULL-extended row itself
            return node
        refs = s.arg.referenced_attrs()
        if not refs or not refs <= right_ids:
            return node
    for a in node.agg_attrs:
        if a.type.is_string:
            return node     # dictionary plumbing not worth the edge case
    try:
        # pushing aggregates R in full; skip when the join would have thrown
        # most of R away first
        if estimate_cardinality(j, db, env) < \
                0.3 * estimate_cardinality(j.right, db, env):
            return node
    except Exception:
        return node

    from quickstep_tpu.optimizer.logical import next_expr_id
    g_attrs = [L.OutAttr(next_expr_id(), f"eagg_k{i}", k.type)
               for i, k in enumerate(j.right_keys)]
    inner = L.Aggregate(
        input=j.right, group_by=list(j.right_keys), group_attrs=g_attrs,
        aggregates=[dataclasses.replace(s) for s in node.aggregates],
        agg_attrs=[L.OutAttr(next_expr_id(), f"eagg_{i}", a.type)
                   for i, a in enumerate(node.agg_attrs)])
    new_join = L.Join(
        left=j.left, right=inner, kind=j.kind,
        left_keys=list(j.left_keys),
        right_keys=[Attr(expr_id=ga.expr_id, name=ga.name, type=ga.type)
                    for ga in g_attrs])
    exprs: List[Expr] = list(node.group_by)
    for s, ia, oa in zip(node.aggregates, inner.agg_attrs, node.agg_attrs):
        ref = Attr(expr_id=ia.expr_id, name=ia.name, type=oa.type)
        if s.fn == "count":
            ref = Case(when_clauses=[(IsNull(operand=ref, negated=True,
                                             type=oa.type), ref)],
                       else_result=Lit(value=0, type=oa.type),
                       type=oa.type)
        exprs.append(ref)
    return L.Project(input=new_join, exprs=exprs, attrs=list(node.output))


def _eager_aggregate_mirror(node, j, db, env):
    """Mirrored eager aggregation (Yan & Larson's other orientation, Q18's
    shape): group keys all come from the BUILD (right) side and are unique
    there; aggregate args all come from the PROBE (left) side. The
    |L|-capacity expansion join plus the |L|-capacity group-by collapse into

        Project( Join(R, Aggregate(L group by join key)) )

    Each group is exactly one R row (group keys unique on R), so the
    per-join-key partial over L IS the group aggregate; INNER join semantics
    drop R rows with no partial exactly like groups with no join rows never
    existed. (Q18: the 8.4M-row join output + 5-key aggregate become a
    1.5M-group aggregate over lineitem — the same shape its own HAVING
    subquery computes — plus a unique join at |orders|.) Returns None when
    the pattern doesn't match."""
    if j.kind != "inner" or not j.left_keys or j.null_aware:
        return None
    left_ids = {a.expr_id for a in j.left.output}
    right_ids = {a.expr_id for a in j.right.output}
    if j.residual is not None:
        # an L-only ON-residual is equivalent to pre-filtering L
        if not j.residual.referenced_attrs() <= left_ids:
            return None
        j = dataclasses.replace(j, left=L.Filter(input=j.left,
                                                 predicate=j.residual),
                                residual=None)
    for ge in node.group_by:
        if not (isinstance(ge, Attr) and ge.expr_id in right_ids):
            return None
    if not keys_unique(j.right, list(node.group_by), db):
        return None
    for s in node.aggregates:
        if s.distinct or s.fn not in ("count", "sum", "min", "max", "avg"):
            return None
        if s.arg is None:   # COUNT(*) counts join rows, not L rows
            return None
        refs = s.arg.referenced_attrs()
        if not refs or not refs <= left_ids:
            return None
    for a in node.agg_attrs:
        if a.type.is_string:
            return None
    try:
        # pushing aggregates L in full; skip when the join would have thrown
        # most of L away first
        if estimate_cardinality(j, db, env) < \
                0.3 * estimate_cardinality(j.left, db, env):
            return None
    except Exception:
        return None

    from quickstep_tpu.optimizer.logical import next_expr_id
    g_attrs = [L.OutAttr(next_expr_id(), f"eagg_k{i}", k.type)
               for i, k in enumerate(j.left_keys)]
    inner = L.Aggregate(
        input=j.left, group_by=list(j.left_keys), group_attrs=g_attrs,
        aggregates=[dataclasses.replace(s) for s in node.aggregates],
        agg_attrs=[L.OutAttr(next_expr_id(), f"eagg_{i}", a.type)
                   for i, a in enumerate(node.agg_attrs)])
    new_join = L.Join(
        left=j.right, right=inner, kind="inner",
        left_keys=list(j.right_keys),
        right_keys=[Attr(expr_id=ga.expr_id, name=ga.name, type=ga.type)
                    for ga in g_attrs])
    exprs: List[Expr] = list(node.group_by)
    for ia, oa in zip(inner.agg_attrs, node.agg_attrs):
        exprs.append(Attr(expr_id=ia.expr_id, name=ia.name, type=oa.type))
    return L.Project(input=new_join, exprs=exprs, attrs=list(node.output))


def _push_semi_to_leaves(node, db, env):
    """Move a SELECTIVE semi/anti join from the top of an inner-join tree
    down onto the leaf that produces its probe keys (Q18: the sum(qty)>300
    orderkey set applies to the orders scan, not to the full
    lineitem⋈orders⋈customer result). Valid through inner joins (per-row
    semantics) when the residual touches only that leaf + the build side.
    Only fires when the build covers a small fraction of the leaf key's
    domain — an unselective semi (Q21's every-orderkey build) stays put,
    where its probe input is smallest."""
    node = _recurse_children(node, lambda c: _push_semi_to_leaves(c, db, env))
    # null_aware semi/anti (IN / NOT IN) push too: their NULL-key behavior is
    # per-row, so it is preserved by relocating the join (flag carried over).
    if not (isinstance(node, L.Join) and node.kind in ("semi", "anti") and
            node.left_keys and
            isinstance(node.left, L.Join) and node.left.kind == "inner"):
        return node
    key_ids = set()
    for lk in node.left_keys:
        if not isinstance(lk, Attr):
            return node
        key_ids.add(lk.expr_id)
    ndv = 1.0
    for lk in node.left_keys:
        st = env.get(lk.expr_id)
        if st and st.ndv:
            ndv = max(ndv, st.ndv)
    if ndv <= 1.0:
        return node
    # Push only when probing at the leaf is no more expensive than probing
    # here (leaf no bigger than the current probe input) AND the build
    # plausibly filters (covers a fraction of the leaf key's domain) — the
    # first condition alone rejects Q21 (probe shrinks 25x before the semi),
    # the second rejects every-key builds that would filter nothing.
    try:
        coverage = estimate_cardinality(node.right, db, env) / ndv
        probe_est = estimate_cardinality(node.left, db, env)
    except Exception:
        return node
    if coverage > 0.6:
        return node
    build_ids = {a.expr_id for a in node.right.output}
    resid_ids = node.residual.referenced_attrs() if node.residual else set()

    def replace_leaf(n):
        if isinstance(n, L.Join) and n.kind == "inner":
            nl = replace_leaf(n.left)
            if nl is not None:
                return dataclasses.replace(n, left=nl)
            nr = replace_leaf(n.right)
            if nr is not None:
                return dataclasses.replace(n, right=nr)
            return None
        leaf_ids = {a.expr_id for a in n.output}
        if key_ids <= leaf_ids and resid_ids <= (leaf_ids | build_ids):
            try:
                if estimate_cardinality(n, db, env) > 1.25 * probe_est:
                    return None
            except Exception:
                return None
            return L.Join(left=n, right=node.right, kind=node.kind,
                          left_keys=node.left_keys,
                          right_keys=node.right_keys,
                          residual=node.residual,
                          null_aware=node.null_aware)
        return None

    pushed = replace_leaf(node.left)
    return pushed if pushed is not None else node


def _annotate_join_estimates(node: L.LogicalNode, db, env) -> None:
    """Stamp each Join with cost-model cardinality estimates of its inputs.
    The runner compacts a join side down to ~4x its estimate before probing,
    so selective filters shrink every downstream gather (the reference's
    blocks-only-hold-matching-tuples effect); a wrong estimate trips an
    overflow flag and the standard retry loop."""
    for c in node.children():
        _annotate_join_estimates(c, db, env)
    if isinstance(node, L.Join):
        try:
            node.est_left_rows = float(estimate_cardinality(node.left, db,
                                                            env))
            node.est_right_rows = float(estimate_cardinality(node.right, db,
                                                             env))
        except Exception:
            pass
    if isinstance(node, L.Aggregate) and node.group_by:
        try:
            node.est_input_rows = float(estimate_cardinality(node.input, db,
                                                             env))
        except Exception:
            pass


def _order_conjuncts(node: L.LogicalNode, env) -> L.LogicalNode:
    """Order AND conjuncts most-selective-first by the cost model — the
    plan-time analog of the reference's LIPFilterAdaptiveProber, which
    reorders filter probes by observed selectivity
    (utility/lip_filter/LIPFilterAdaptiveProber.hpp:51). Evaluation is fused
    under XLA, but the order drives short-circuit-style mask combination in
    eager/profiled runs and keeps SMA-prunable conjuncts first for the
    streamed path."""
    for f in dataclasses.fields(node) if dataclasses.is_dataclass(node) else []:
        v = getattr(node, f.name)
        if isinstance(v, L.LogicalNode):
            setattr(node, f.name, _order_conjuncts(v, env))
        elif isinstance(v, list) and v and isinstance(v[0], L.LogicalNode):
            setattr(node, f.name, [_order_conjuncts(x, env) for x in v])
    if isinstance(node, L.Filter) and isinstance(node.predicate, Logical) \
            and node.predicate.op == "AND":
        ops = sorted(node.predicate.operands,
                     key=lambda o: estimate_selectivity(o, env))
        node = dataclasses.replace(
            node, predicate=dataclasses.replace(node.predicate, operands=ops))
    return node


# ---- join reordering ----

def _reorder_joins(node: L.LogicalNode, db, env) -> L.LogicalNode:
    # recurse first (bottom-up)
    for f in dataclasses.fields(node) if dataclasses.is_dataclass(node) else []:
        v = getattr(node, f.name)
        if isinstance(v, L.LogicalNode):
            setattr(node, f.name, _reorder_joins(v, db, env))
        elif isinstance(v, list) and v and isinstance(v[0], L.LogicalNode):
            setattr(node, f.name, [_reorder_joins(x, db, env) for x in v])
    if isinstance(node, L.Join) and node.kind == "inner":
        leaves, edges = _flatten_inner_joins(node)
        if len(leaves) > 2:
            return _greedy_join_order(leaves, edges, db, env)
        # two-way: just orient build side
        return _orient_join(node, db, env)
    if isinstance(node, L.Join):
        return _orient_join(node, db, env)
    return node


def _flatten_inner_joins(node: L.Join):
    """Collect the maximal tree of inner equi-joins into (leaves, edges)."""
    leaves: List[L.LogicalNode] = []
    edges: List[Tuple[List[Expr], List[Expr], Optional[Expr]]] = []

    def walk(n):
        if isinstance(n, L.Join) and n.kind == "inner" and n.left_keys:
            walk(n.left)
            walk(n.right)
            edges.append((n.left_keys, n.right_keys, n.residual))
        else:
            leaves.append(n)
    walk(node)
    return leaves, edges


def _greedy_join_order(leaves, edges, db, env) -> L.LogicalNode:
    comps = list(leaves)
    comp_ids = [{a.expr_id for a in p.output} for p in comps]
    cards = [estimate_cardinality(p, db, env) for p in comps]
    remaining = list(edges)

    def find_comp(ids: set) -> Optional[int]:
        for i, cid in enumerate(comp_ids):
            if cid and ids <= cid:
                return i
        return None

    while remaining:
        best = None
        best_cost = None
        for ei, (lk, rk, res) in enumerate(remaining):
            li = find_comp(set().union(*[k.referenced_attrs() for k in lk]))
            ri = find_comp(set().union(*[k.referenced_attrs() for k in rk]))
            if li is None or ri is None or li == ri:
                continue
            # estimated output of joining these components — same model as
            # estimate_cardinality's join case: unique-side containment
            # first (each probe row matches at most once; match rate =
            # fraction of the unique side's BASE relation retained), else
            # per-side ndv products capped by side cardinality (the naive
            # product over-divides composite keys: ndv(a)*ndv(b) >>
            # ndv(a,b), which made Q9 join lineitem⋈partsupp before the
            # 5%-selective part filter).
            ub_r = _unique_build_base_rows(comps[ri], rk, db)
            ub_l = _unique_build_base_rows(comps[li], lk, db)
            if ub_r:
                out = cards[li] * min(1.0, cards[ri] / ub_r)
            elif ub_l:
                out = cards[ri] * min(1.0, cards[li] / ub_l)
            else:
                def side_ndv(keys, card):
                    nd = 1.0
                    for k in keys:
                        if isinstance(k, Attr):
                            st = env.get(k.expr_id)
                            nd *= (st.ndv if st and st.ndv else 100.0)
                        else:
                            nd *= 100.0
                    return min(nd, max(card, 1.0))
                denom = max(side_ndv(lk, cards[li]),
                            side_ndv(rk, cards[ri]), 1.0)
                out = cards[li] * cards[ri] / denom
            out = max(out, 1.0)
            if best_cost is None or out < best_cost:
                best_cost = out
                best = (ei, li, ri)
        if best is None:
            break
        ei, li, ri = best
        # gather all edges joining the same two components
        lk_all, rk_all, res_all = [], [], []
        keep = []
        for e2 in remaining:
            lk, rk, res = e2
            eli = find_comp(set().union(*[k.referenced_attrs() for k in lk]))
            eri = find_comp(set().union(*[k.referenced_attrs() for k in rk]))
            if {eli, eri} == {li, ri}:
                if eli == li:
                    lk_all.extend(lk)
                    rk_all.extend(rk)
                else:
                    lk_all.extend(rk)
                    rk_all.extend(lk)
                if res is not None:
                    res_all.append(res)
            else:
                keep.append(e2)
        remaining = keep
        from quickstep_tpu.expressions.scalar import make_and
        j = L.Join(left=comps[li], right=comps[ri], kind="inner",
                   left_keys=lk_all, right_keys=rk_all,
                   residual=make_and(res_all))
        j = _orient_join(j, db, env)
        comps[li] = j
        comp_ids[li] = comp_ids[li] | comp_ids[ri]
        cards[li] = best_cost
        comps[ri] = None
        comp_ids[ri] = set()
        cards[ri] = 0.0
    alive = [c for c in comps if c is not None]
    plan = alive[0]
    for c in alive[1:]:
        plan = L.Join(left=plan, right=c, kind="cross")
    return plan


def _orient_join(node: L.Join, db, env) -> L.Join:
    """SwapProbeBuild: right side is the build side — prefer unique keys there,
    then smaller cardinality. semi/anti/left joins are side-fixed."""
    if node.kind != "inner" or not node.left_keys:
        return node
    lu = keys_unique(node.left, node.left_keys, db)
    ru = keys_unique(node.right, node.right_keys, db)
    cl = estimate_cardinality(node.left, db, env)
    cr = estimate_cardinality(node.right, db, env)
    swap = False
    if lu and not ru:
        swap = True
    elif lu == ru and cl < cr:
        swap = True
    if swap:
        return L.Join(left=node.right, right=node.left, kind="inner",
                      left_keys=node.right_keys, right_keys=node.left_keys,
                      residual=node.residual)
    return node


# ---- column pruning ----

def _prune_columns(plan: L.LogicalNode) -> L.LogicalNode:
    """Trim TableScan outputs to attrs actually consumed above them
    (reference PruneColumns rule)."""
    required: set = set()

    def note_exprs(node):
        from quickstep_tpu.exec.executor import _node_exprs
        for e in _node_exprs(node):
            stack = [e]
            while stack:
                x = stack.pop()
                if isinstance(x, Attr):
                    required.add(x.expr_id)
                from quickstep_tpu.expressions.subquery import SubqueryScalar
                if isinstance(x, SubqueryScalar):
                    collect(x.plan)
                stack.extend(x.children())

    def collect(node):
        note_exprs(node)
        if isinstance(node, L.SharedSubplan):
            for fresh, orig in zip(node.attrs, node.plan.output):
                if fresh.expr_id in required:
                    required.add(orig.expr_id)
        if isinstance(node, (L.Distinct, L.SetOperation)):
            for c in node.children():
                for a in c.output:
                    required.add(a.expr_id)
        for c in node.children():
            collect(c)

    # everything the root outputs is required
    for a in plan.output:
        required.add(a.expr_id)
    collect(plan)
    # second pass: SharedSubplan refs discovered late
    collect(plan)

    def rewrite(node):
        if isinstance(node, L.TableScan):
            kept = [a for a in node.attrs if a.expr_id in required]
            if kept:
                node.attrs = kept
            else:
                node.attrs = node.attrs[:1]  # keep one column for row counts
            return node
        for f in dataclasses.fields(node) if dataclasses.is_dataclass(node) \
                else []:
            v = getattr(node, f.name)
            if isinstance(v, L.LogicalNode):
                rewrite(v)
            elif isinstance(v, list) and v and isinstance(v[0], L.LogicalNode):
                for x in v:
                    rewrite(x)
        if isinstance(node, L.SharedSubplan):
            rewrite(node.plan)
        return node

    return rewrite(plan)
