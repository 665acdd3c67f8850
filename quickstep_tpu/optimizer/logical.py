"""Logical plan nodes.

Parity with the reference's query_optimizer/logical/ node set (25 classes: Aggregate,
Filter, HashJoin/NestedLoopsJoin, Project, Sort, SetOperation, TableReference,
WindowAggregate, DML/DDL nodes ...). Immutable-ish dataclass trees; every node exposes
`output`: the list of produced attributes, each with a global ExprId, SQL type, and (for
string columns) the host-side ordered dictionary — dictionaries are plan-time metadata
here, which is what lets the resolver lower all string operations to code arithmetic.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Optional, Tuple

from quickstep_tpu.types import Type
from quickstep_tpu.expressions.scalar import Expr
from quickstep_tpu.expressions.aggregate import AggregateSpec
from quickstep_tpu.storage.dictionary import Dictionary

_expr_id_counter = itertools.count()


def next_expr_id() -> int:
    return next(_expr_id_counter)


@dataclasses.dataclass
class OutAttr:
    """One output attribute of a plan node."""
    expr_id: int
    name: str
    type: Type
    dictionary: Optional[Dictionary] = None


@dataclasses.dataclass
class LogicalNode:
    @property
    def output(self) -> List[OutAttr]:
        raise NotImplementedError

    def children(self) -> List["LogicalNode"]:
        return []

    def tree_string(self, indent: int = 0) -> str:
        """Pretty plan tree (TreeStringSerializable analog) for golden plan tests."""
        pad = "  " * indent
        label = self._label()
        lines = [f"{pad}{label}"]
        for c in self.children():
            lines.append(c.tree_string(indent + 1))
        return "\n".join(lines)

    def _label(self) -> str:
        return type(self).__name__


@dataclasses.dataclass
class TableScan(LogicalNode):
    relation_name: str
    attrs: List[OutAttr] = dataclasses.field(default_factory=list)
    alias: Optional[str] = None
    sample_kind: Optional[str] = None
    sample_percent: int = 0

    @property
    def output(self):
        return self.attrs

    def _label(self):
        a = f" AS {self.alias}" if self.alias and self.alias != self.relation_name else ""
        return f"TableScan[{self.relation_name}{a}]"


@dataclasses.dataclass
class Generator(LogicalNode):
    """generate_series(start, end[, step]) (expressions/table_generator/ analog)."""
    start: int = 0
    end: int = 0
    step: int = 1
    attrs: List[OutAttr] = dataclasses.field(default_factory=list)

    @property
    def output(self):
        return self.attrs

    def _label(self):
        return f"Generator[generate_series({self.start},{self.end},{self.step})]"


@dataclasses.dataclass
class Filter(LogicalNode):
    input: LogicalNode = None
    predicate: Expr = None

    @property
    def output(self):
        return self.input.output

    def children(self):
        return [self.input]

    def _label(self):
        return "Filter"


@dataclasses.dataclass
class Project(LogicalNode):
    input: LogicalNode = None
    exprs: List[Expr] = dataclasses.field(default_factory=list)
    attrs: List[OutAttr] = dataclasses.field(default_factory=list)  # parallel to exprs

    @property
    def output(self):
        return self.attrs

    def children(self):
        return [self.input]

    def _label(self):
        return f"Project[{', '.join(a.name for a in self.attrs)}]"


@dataclasses.dataclass
class Join(LogicalNode):
    """Equi-join with optional residual predicate. kind: inner | left | right | full |
    semi | anti | cross (reference HashJoin JoinTypes + NestedLoopsJoin)."""
    left: LogicalNode = None
    right: LogicalNode = None
    kind: str = "inner"
    left_keys: List[Expr] = dataclasses.field(default_factory=list)
    right_keys: List[Expr] = dataclasses.field(default_factory=list)
    residual: Optional[Expr] = None
    # [NOT] IN subquery three-valued-logic semantics on key pair 0: a NULL
    # operand never passes, and NOT IN passes nothing when the inner side
    # contains a NULL (unless empty)
    null_aware: bool = False
    # cost-model cardinality estimates (rules._annotate_join_estimates):
    # drive pre-join dynamic compaction so join gathers run at the estimated
    # live size, not the full padded capacity
    est_left_rows: Optional[float] = None
    est_right_rows: Optional[float] = None

    @property
    def output(self):
        if self.kind in ("semi", "anti"):
            return self.left.output
        out = list(self.left.output) + list(self.right.output)
        return out

    def children(self):
        return [self.left, self.right]

    def _label(self):
        keys = ", ".join(f"{getattr(l, 'name', '?')}={getattr(r, 'name', '?')}"
                         for l, r in zip(self.left_keys, self.right_keys))
        return f"Join[{self.kind}; {keys}]" + (" +residual" if self.residual else "")


@dataclasses.dataclass
class Aggregate(LogicalNode):
    input: LogicalNode = None
    group_by: List[Expr] = dataclasses.field(default_factory=list)
    group_attrs: List[OutAttr] = dataclasses.field(default_factory=list)
    aggregates: List[AggregateSpec] = dataclasses.field(default_factory=list)
    agg_attrs: List[OutAttr] = dataclasses.field(default_factory=list)
    # cost-model input-cardinality estimate (rules._annotate_join_estimates):
    # drives pre-aggregate dynamic compaction so the group-by sort runs at
    # the estimated live size, not the upstream capacity
    est_input_rows: Optional[float] = None

    @property
    def output(self):
        return list(self.group_attrs) + list(self.agg_attrs)

    def children(self):
        return [self.input]

    def _label(self):
        g = ", ".join(a.name for a in self.group_attrs)
        a = ", ".join(f"{s.fn}({'DISTINCT ' if s.distinct else ''})"
                      for s in self.aggregates)
        return f"Aggregate[group: {g}; aggs: {a}]"


@dataclasses.dataclass
class WindowAggregate(LogicalNode):
    """One window function over the input (reference WindowAggregationOperator)."""
    input: LogicalNode = None
    spec: AggregateSpec = None
    partition_by: List[Expr] = dataclasses.field(default_factory=list)
    order_by: List[Expr] = dataclasses.field(default_factory=list)
    order_ascending: List[bool] = dataclasses.field(default_factory=list)
    frame: Optional[object] = None   # parser WindowFrame
    out_attr: OutAttr = None

    @property
    def output(self):
        return list(self.input.output) + [self.out_attr]

    def children(self):
        return [self.input]

    def _label(self):
        return f"WindowAggregate[{self.spec.fn}]"


@dataclasses.dataclass
class Sort(LogicalNode):
    input: LogicalNode = None
    keys: List[Expr] = dataclasses.field(default_factory=list)
    ascending: List[bool] = dataclasses.field(default_factory=list)
    nulls_first: List[Optional[bool]] = dataclasses.field(default_factory=list)
    limit: Optional[int] = None

    @property
    def output(self):
        return self.input.output

    def children(self):
        return [self.input]

    def _label(self):
        lim = f" limit={self.limit}" if self.limit is not None else ""
        return f"Sort[{len(self.keys)} keys{lim}]"


@dataclasses.dataclass
class Limit(LogicalNode):
    input: LogicalNode = None
    limit: int = 0

    @property
    def output(self):
        return self.input.output

    def children(self):
        return [self.input]


@dataclasses.dataclass
class Distinct(LogicalNode):
    input: LogicalNode = None

    @property
    def output(self):
        return self.input.output

    def children(self):
        return [self.input]


@dataclasses.dataclass
class RowNumber(LogicalNode):
    """Appends a synthetic unique row-id column — the outer-row identity used
    by general (non-equality) correlated-subquery decorrelation (reference
    UnnestSubqueries' outer-query grouping, query_optimizer/rules/
    UnnestSubqueries.cpp)."""
    input: LogicalNode = None
    out_attr: OutAttr = None

    @property
    def output(self):
        return list(self.input.output) + [self.out_attr]

    def children(self):
        return [self.input]

    def _label(self):
        return "RowNumber"


@dataclasses.dataclass
class SetOperation(LogicalNode):
    """UNION [ALL] / INTERSECT over schema-aligned inputs."""
    kind: str = "union_all"
    inputs: List[LogicalNode] = dataclasses.field(default_factory=list)
    attrs: List[OutAttr] = dataclasses.field(default_factory=list)

    @property
    def output(self):
        return self.attrs

    def children(self):
        return self.inputs

    def _label(self):
        return f"SetOperation[{self.kind}]"


@dataclasses.dataclass
class SharedSubplan(LogicalNode):
    """A WITH-clause subplan materialized once and referenced many times
    (reference TopLevelPlan shared_subplans)."""
    name: str = ""
    plan: LogicalNode = None
    attrs: List[OutAttr] = dataclasses.field(default_factory=list)

    @property
    def output(self):
        return self.attrs

    def children(self):
        return [self.plan]

    def _label(self):
        return f"SharedSubplanRef[{self.name}]"
