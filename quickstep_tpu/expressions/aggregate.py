"""Aggregate function descriptors.

Parity with the reference's expressions/aggregation/ (AggregateFunction.hpp:58 factory +
AggregationHandle.hpp:104 accumulate/merge/finalize). The actual vectorized accumulation
kernels live in ops/hash_group.py (grouped) and ops/simple_agg.py (scalar); this module
defines the typed specs the planner carries.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from quickstep_tpu.types import Type, TypeID, LONG, DOUBLE
from quickstep_tpu.expressions.scalar import Expr

AGG_FUNCTIONS = ("sum", "count", "avg", "min", "max")


@dataclasses.dataclass
class AggregateSpec:
    """One aggregate in an Aggregate plan node."""

    fn: str                       # sum | count | avg | min | max
    arg: Optional[Expr]           # None for COUNT(*)
    distinct: bool = False
    result_type: Type = None

    @staticmethod
    def result_type_for(fn: str, arg: Optional[Expr]) -> Type:
        """SQL result typing, matching the reference handles: COUNT -> LONG; AVG ->
        DOUBLE; SUM of integral -> LONG, of floating -> DOUBLE/FLOAT; MIN/MAX keep
        the argument type."""
        if fn == "count":
            return LONG
        if arg is None:
            raise ValueError(f"{fn} requires an argument")
        t = arg.type
        nullable = True  # aggregates over empty groups are NULL (except COUNT)
        if fn == "avg":
            if t.type_id == TypeID.DATETIME_INTERVAL or \
               t.type_id == TypeID.YEARMONTH_INTERVAL:
                return t.with_nullable(True)
            return DOUBLE.with_nullable(nullable)
        if fn == "sum":
            if t.is_integral:
                return LONG.with_nullable(nullable)
            if t.type_id == TypeID.FLOAT:
                return DOUBLE.with_nullable(nullable)  # accumulate in double
            if t.type_id == TypeID.DECIMAL:
                # exact int64 accumulation of units (fits through SF10+:
                # e.g. Q1 sum_charge at scale 6 is ~1.6e18 < 2^63)
                return Type(TypeID.DECIMAL, nullable=True, precision=18,
                            scale=t.scale)
            return t.with_nullable(nullable)
        if fn in ("min", "max"):
            return t.with_nullable(nullable)
        raise ValueError(f"unknown aggregate {fn}")
