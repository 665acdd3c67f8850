"""SQL AST node definitions.

Capability parity with the reference's parser/Parse*.hpp node set (~45 classes over
SELECT with joins/subqueries/set-ops/window clauses, DDL with BLOCKPROPERTIES and
PARTITION BY, DML, COPY — grammar parser/SqlParser.ypp). Python dataclasses, one class
per syntactic construct; every node carries (line, column) for SqlError reporting.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple


@dataclasses.dataclass
class Node:
    line: int = dataclasses.field(default=-1, kw_only=True)
    column: int = dataclasses.field(default=-1, kw_only=True)


# ===================== expressions =====================

@dataclasses.dataclass
class Expr(Node):
    pass


@dataclasses.dataclass
class Literal(Expr):
    value: object = None          # python int/float/str/None
    type_hint: Optional[str] = None  # 'date' | 'datetime' | 'interval:<unit-kind>' | None
    text: Optional[str] = None    # original source spelling (for display names)


@dataclasses.dataclass
class IntervalLiteral(Expr):
    kind: str = ""    # 'datetime_interval' | 'yearmonth_interval'
    amount: int = 0   # microseconds or months
    text: Optional[str] = None    # original source spelling, e.g. "1 year"


@dataclasses.dataclass
class ColumnRef(Expr):
    name: str = ""
    table: Optional[str] = None


@dataclasses.dataclass
class Star(Expr):
    table: Optional[str] = None   # COUNT(*) or t.*


@dataclasses.dataclass
class BinaryExpr(Expr):
    op: str = ""                  # + - * / % = <> < <= > >= AND OR LIKE NOT_LIKE REGEXP
    left: Expr = None
    right: Expr = None


@dataclasses.dataclass
class UnaryExpr(Expr):
    op: str = ""                  # - NOT
    operand: Expr = None


@dataclasses.dataclass
class IsNullExpr(Expr):
    operand: Expr = None
    negated: bool = False


@dataclasses.dataclass
class BetweenExpr(Expr):
    operand: Expr = None
    low: Expr = None
    high: Expr = None
    negated: bool = False


@dataclasses.dataclass
class InListExpr(Expr):
    operand: Expr = None
    items: List[Expr] = dataclasses.field(default_factory=list)
    negated: bool = False


@dataclasses.dataclass
class InSubqueryExpr(Expr):
    operand: Expr = None
    subquery: "SelectStmt" = None
    negated: bool = False


@dataclasses.dataclass
class ExistsExpr(Expr):
    subquery: "SelectStmt" = None
    negated: bool = False


@dataclasses.dataclass
class ScalarSubqueryExpr(Expr):
    subquery: "SelectStmt" = None


@dataclasses.dataclass
class FunctionCall(Expr):
    name: str = ""
    args: List[Expr] = dataclasses.field(default_factory=list)
    distinct: bool = False
    is_star: bool = False         # COUNT(*)
    window: Optional["WindowSpec"] = None  # OVER (...)
    src_name: Optional[str] = None  # original casing (for display names)


@dataclasses.dataclass
class CaseExpr(Expr):
    operand: Optional[Expr] = None                 # CASE x WHEN ... (simple) or None (searched)
    when_clauses: List[Tuple[Expr, Expr]] = dataclasses.field(default_factory=list)
    else_result: Optional[Expr] = None


@dataclasses.dataclass
class CastExpr(Expr):
    operand: Expr = None
    target_type_name: str = ""
    target_length: int = 0
    target_scale: object = None   # DECIMAL(p, s) second parameter


@dataclasses.dataclass
class ExtractExpr(Expr):
    field: str = ""               # YEAR MONTH DAY HOUR MINUTE SECOND
    operand: Expr = None
    field_src: Optional[str] = None  # original casing (for display names)


@dataclasses.dataclass
class SubstringExpr(Expr):
    operand: Expr = None
    start: Expr = None            # 1-based
    length: Optional[Expr] = None


# ===================== window =====================

@dataclasses.dataclass
class WindowFrame(Node):
    mode: str = "rows"            # rows | range
    start_unbounded: bool = True
    start_offset: int = 0         # preceding offset when not unbounded
    end_unbounded: bool = False
    end_offset: int = 0           # following offset ("current row" = 0)


@dataclasses.dataclass
class WindowSpec(Node):
    name: Optional[str] = None
    partition_by: List[Expr] = dataclasses.field(default_factory=list)
    order_by: List["OrderItem"] = dataclasses.field(default_factory=list)
    frame: Optional[WindowFrame] = None


# ===================== query =====================

@dataclasses.dataclass
class SelectItem(Node):
    expr: Expr = None
    alias: Optional[str] = None


@dataclasses.dataclass
class OrderItem(Node):
    expr: Expr = None
    ascending: bool = True
    nulls_first: Optional[bool] = None


@dataclasses.dataclass
class TableRef(Node):
    pass


@dataclasses.dataclass
class BaseTableRef(TableRef):
    name: str = ""
    alias: Optional[str] = None
    sample_kind: Optional[str] = None   # blocksample | tuplesample
    sample_percent: int = 0


@dataclasses.dataclass
class SubqueryTableRef(TableRef):
    subquery: "SelectStmt" = None
    alias: Optional[str] = None
    column_aliases: List[str] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class JoinRef(TableRef):
    kind: str = "inner"           # inner | left | right | full | cross
    left: TableRef = None
    right: TableRef = None
    condition: Optional[Expr] = None


@dataclasses.dataclass
class GeneratorTableRef(TableRef):
    """Table generator function in FROM, e.g. generate_series(1, 10)
    (reference expressions/table_generator/, GENERATOR_FUNCTIONS.md)."""
    name: str = ""
    args: List[Expr] = dataclasses.field(default_factory=list)
    alias: Optional[str] = None
    column_aliases: List[str] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class WithEntry(Node):
    name: str = ""
    column_aliases: List[str] = dataclasses.field(default_factory=list)
    query: "SelectStmt" = None


@dataclasses.dataclass
class Statement(Node):
    pass


@dataclasses.dataclass
class SelectStmt(Statement):
    with_entries: List[WithEntry] = dataclasses.field(default_factory=list)
    distinct: bool = False
    select_list: List[SelectItem] = dataclasses.field(default_factory=list)
    from_tables: List[TableRef] = dataclasses.field(default_factory=list)
    where: Optional[Expr] = None
    group_by: List[Expr] = dataclasses.field(default_factory=list)
    having: Optional[Expr] = None
    windows: List[Tuple[str, WindowSpec]] = dataclasses.field(default_factory=list)
    order_by: List[OrderItem] = dataclasses.field(default_factory=list)
    limit: Optional[int] = None
    # left-associative set-operation chain applied to this select:
    # [(op, rhs), ...] with op in {union, union_all, intersect}
    set_ops: List[Tuple[str, "SelectStmt"]] = dataclasses.field(default_factory=list)
    # ORDER BY/LIMIT over the whole set operation (only when the last operand
    # was parenthesized; otherwise a trailing ORDER BY binds to the last
    # operand, as in the reference grammar — order_by/limit above are
    # branch-local)
    set_order_by: List[OrderItem] = dataclasses.field(default_factory=list)
    set_limit: Optional[int] = None
    priority: Optional[int] = None        # WITH PRIORITY clause (ParsePriority.hpp)


# ===================== DDL / DML =====================

@dataclasses.dataclass
class ColumnDef(Node):
    name: str = ""
    type_name: str = ""
    type_length: int = 0
    type_scale: object = None     # DECIMAL(p, s) second parameter
    not_null: bool = False
    nullable: bool = False        # explicit NULL marker (reference grammar:
    #                               columns default to NOT NULL)
    unique: bool = False          # parsed, recorded in catalog (not enforced, as reference)


@dataclasses.dataclass
class CreateTableStmt(Statement):
    name: str = ""
    columns: List[ColumnDef] = dataclasses.field(default_factory=list)
    block_properties: dict = dataclasses.field(default_factory=dict)
    partition_kind: Optional[str] = None      # hash | range
    partition_attrs: List[str] = dataclasses.field(default_factory=list)
    partition_attr_pos: List[Tuple[int, int]] = dataclasses.field(
        default_factory=list)            # (line, col) per attr, for SqlError
    partition_count: int = 0


@dataclasses.dataclass
class CreateIndexStmt(Statement):
    index_name: str = ""
    table_name: str = ""
    attrs: List[str] = dataclasses.field(default_factory=list)
    index_type: str = "csbtree"


@dataclasses.dataclass
class DropTableStmt(Statement):
    name: str = ""


@dataclasses.dataclass
class InsertStmt(Statement):
    table_name: str = ""
    # one of: literal rows, or INSERT INTO t SELECT ...
    rows: List[List[Expr]] = dataclasses.field(default_factory=list)
    select: Optional[SelectStmt] = None


@dataclasses.dataclass
class UpdateStmt(Statement):
    table_name: str = ""
    assignments: List[Tuple[str, Expr]] = dataclasses.field(default_factory=list)
    where: Optional[Expr] = None


@dataclasses.dataclass
class DeleteStmt(Statement):
    table_name: str = ""
    where: Optional[Expr] = None


@dataclasses.dataclass
class CopyStmt(Statement):
    table_name: str = ""
    direction: str = "from"       # from | to
    path: str = ""                # file path, or 'stdout'/'stderr'
    select: Optional["SelectStmt"] = None   # COPY <query> TO ...
    options: dict = dataclasses.field(default_factory=dict)  # delimiter, format, header, null_string


@dataclasses.dataclass
class CommandStmt(Statement):
    r"""CLI backslash command: \dt, \d rel, \analyze (reference cli/Constants.hpp:30-32)."""
    command: str = ""
    args: List[str] = dataclasses.field(default_factory=list)


# ===================== display-name generation =====================
# Parity with the reference's ParseExpression::generateName()
# (parser/ParseBasicExpressions.cpp:45-214, ParseLiteralValue.hpp:125,222,
# ParseCaseExpressions.cpp:61-110): the display name the resolver assigns to an
# unaliased select-list expression.

def generate_name(e: "Expr") -> str:
    if isinstance(e, Literal):
        if e.value is None:
            return "NULL"
        if e.type_hint == "date":
            return f"Date('{e.text}')"
        if e.type_hint == "datetime":
            return f"Datetime('{e.text}')"
        if isinstance(e.value, str) and e.type_hint is None:
            return f"'{e.value}'"
        if e.text is not None:
            return e.text
        if isinstance(e.value, float):
            return repr(e.value)
        return str(e.value)
    if isinstance(e, IntervalLiteral):
        # reference TypedValue names: DatetimeInterval('1 day') etc.
        tn = ("YearMonthInterval" if e.kind == "yearmonth_interval"
              else "DatetimeInterval")
        return f"{tn}('{e.text}')"
    if isinstance(e, ScalarSubqueryExpr):
        return "SubqueryExpression"
    if isinstance(e, ColumnRef):
        return f"{e.table}.{e.name}" if e.table else e.name
    if isinstance(e, Star):
        return "*"
    if isinstance(e, BinaryExpr):
        return (f"({generate_name(e.left)}{e.op}"
                f"{generate_name(e.right)})")
    if isinstance(e, UnaryExpr):
        op = "NOT " if e.op.upper() == "NOT" else e.op
        return f"{op}{generate_name(e.operand)}"
    if isinstance(e, FunctionCall):
        nm = e.src_name or e.name
        if e.is_star:
            return f"{nm}(*)"
        inner = ", ".join(generate_name(a) for a in e.args)
        return f"{nm}({'DISTINCT ' if e.distinct else ''}{inner})"
    if isinstance(e, ExtractExpr):
        field = e.field_src or e.field
        return f"EXTRACT({field} FROM {generate_name(e.operand)})"
    if isinstance(e, SubstringExpr):
        out = f"SUBSTRING({generate_name(e.operand)} FROM {generate_name(e.start)}"
        if e.length is not None:
            out += f" FOR {generate_name(e.length)}"
        return out + ")"
    if isinstance(e, CaseExpr):
        parts = ["CASE"]
        if e.operand is not None:
            parts.append(f" {generate_name(e.operand)}")
        for cond, res in e.when_clauses:
            parts.append(f" WHEN {generate_name(cond)} THEN {generate_name(res)}")
        if e.else_result is not None:
            parts.append(f" ELSE {generate_name(e.else_result)}")
        parts.append(" END")
        return "".join(parts)
    if isinstance(e, CastExpr):
        return f"CAST({generate_name(e.operand)} AS {e.target_type_name})"
    if isinstance(e, IsNullExpr):
        neg = " IS NOT NULL" if e.negated else " IS NULL"
        return generate_name(e.operand) + neg
    return "expr"
