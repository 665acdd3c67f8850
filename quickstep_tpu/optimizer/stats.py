"""Plan-time interval/cardinality inference over resolved expressions.

The cost-model substrate (reference cost_model/StarSchemaSimpleCostModel.hpp:58 pulls
min/max/ndistinct from CatalogRelationStatistics): here ranges drive the physical
choices — dense (collision-free) aggregation domains and direct-address join tables.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from quickstep_tpu.expressions.scalar import (
    Expr, Attr, Lit, Arith, Case, Cast, ExtractDate, Substr,
)

Range = Optional[Tuple[int, int]]


def infer_range(e: Expr, env: Dict[int, Range]) -> Range:
    """Integer value range of `e` given attribute ranges, or None if unbounded/
    non-integral. Conservative (over-approximates)."""
    if isinstance(e, Attr):
        return env.get(e.expr_id)
    if isinstance(e, Lit):
        if isinstance(e.value, int):
            return (e.value, e.value)
        return None
    if isinstance(e, Cast):
        if e.type.is_integral:
            return infer_range(e.operand, env)
        return None
    if isinstance(e, ExtractDate):
        r = infer_range(e.operand, env)
        if e.field == "year":
            if r is not None and e.operand.type.type_id.name == "DATE":
                return (r[0] >> 9, r[1] >> 9)
            return (0, 9999)
        if e.field == "month":
            return (1, 12)
        if e.field == "day":
            return (1, 31)
        if e.field == "hour":
            return (0, 23)
        return (0, 60)
    if isinstance(e, Substr):
        import numpy as np
        rm = e.remap
        if rm is not None and len(rm):
            return (int(np.min(rm)), int(np.max(rm)))
        return (0, 0)
    if isinstance(e, Arith):
        a = infer_range(e.lhs, env)
        b = infer_range(e.rhs, env)
        if a is None or b is None:
            return None
        if e.op == "+":
            return (a[0] + b[0], a[1] + b[1])
        if e.op == "-":
            return (a[0] - b[1], a[1] - b[0])
        if e.op == "*":
            cands = [a[0] * b[0], a[0] * b[1], a[1] * b[0], a[1] * b[1]]
            return (min(cands), max(cands))
        return None
    if isinstance(e, Case):
        out = None
        for _, r in e.when_clauses:
            rr = infer_range(r, env)
            if rr is None:
                return None
            out = rr if out is None else (min(out[0], rr[0]), max(out[1], rr[1]))
        if e.else_result is not None:
            rr = infer_range(e.else_result, env)
            if rr is None:
                return None
            out = rr if out is None else (min(out[0], rr[0]), max(out[1], rr[1]))
        return out
    return None
