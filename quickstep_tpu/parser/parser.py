"""SQL parser: hand-written recursive descent + Pratt expressions.

Grammar surface parity with the reference bison grammar (parser/SqlParser.ypp): SELECT
with joins/subqueries/set-ops/window clauses/WITH, CREATE TABLE (BLOCKPROPERTIES,
PARTITION BY), CREATE INDEX, INSERT, UPDATE, DELETE, DROP TABLE, COPY FROM/TO, LIMIT,
sample clauses, priority clause, and backslash CLI commands. Produces the AST in
ast_nodes.py. The reference's push-parser interface (SqlParserWrapper.hpp:71
feedNextBuffer/getNextStatement) maps to parse_statements() yielding one AST per ';'.
"""

from __future__ import annotations

from typing import List, Optional

from quickstep_tpu.errors import ParseError
from quickstep_tpu.parser.lexer import Token, tokenize
from quickstep_tpu.parser import ast_nodes as A
from quickstep_tpu.types.datetime_util import (
    parse_date_literal, parse_datetime_literal, parse_interval_literal,
)

_CMP_OPS = {"=", "<>", "<", "<=", ">", ">="}


class _Parser:
    def __init__(self, tokens: List[Token], text: str):
        self.toks = tokens
        self.pos = 0
        self.text = text

    # ---------- token helpers ----------
    def peek(self, offset: int = 0) -> Token:
        return self.toks[min(self.pos + offset, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.pos]
        if t.kind != "eof":
            self.pos += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "keyword" and t.value in kws

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.kind == "op" and t.value in ops

    def accept_kw(self, *kws: str) -> Optional[Token]:
        if self.at_kw(*kws):
            return self.next()
        return None

    def accept_op(self, *ops: str) -> Optional[Token]:
        if self.at_op(*ops):
            return self.next()
        return None

    def expect_kw(self, kw: str) -> Token:
        t = self.peek()
        if not t.is_kw(kw):
            raise self.err(f"expected {kw.upper()}")
        return self.next()

    def expect_op(self, op: str) -> Token:
        t = self.peek()
        if not (t.kind == "op" and t.value == op):
            raise self.err(f"expected {op!r}")
        return self.next()

    def expect_ident(self) -> str:
        t = self.peek()
        if t.kind == "ident":
            return self.next().value
        # Non-reserved keywords usable as identifiers in practice.
        if t.kind == "keyword" and t.value in (
                "date", "year", "month", "day", "hour", "minute", "second", "key",
                "first", "last", "value", "hash", "range", "row", "time"):
            return self.next().value
        raise self.err("expected identifier")

    def err(self, msg: str) -> ParseError:
        t = self.peek()
        return ParseError(f"syntax error: {msg}, got "
                          f"{t.value if t.kind != 'eof' else 'end of input'!r}",
                          t.line, t.column)

    # ---------- statements ----------
    def parse_statement(self) -> A.Statement:
        t = self.peek()
        if t.kind == "command":
            self.next()
            parts = t.value.split()
            return A.CommandStmt(command=parts[0], args=parts[1:],
                                 line=t.line, column=t.column)
        if t.is_kw("with"):
            # WITH ctes {SELECT | INSERT | COPY} (reference grammar allows a
            # CTE prefix on INSERT ... SELECT and COPY <query> TO)
            entries = self.parse_with_entries()
            nxt = self.peek()
            if nxt.is_kw("insert"):
                stmt = self.parse_insert()
                if stmt.select is None:
                    raise self.err("WITH requires INSERT ... SELECT")
                stmt.select.with_entries = entries + stmt.select.with_entries
                return stmt
            if nxt.is_kw("copy"):
                stmt = self.parse_copy()
                if stmt.select is None:
                    raise self.err("WITH requires COPY <query> TO")
                stmt.select.with_entries = entries + stmt.select.with_entries
                return stmt
            sel = self.parse_select()
            sel.with_entries = entries + sel.with_entries
            return sel
        if t.is_kw("select") or self.at_op("("):
            return self.parse_select()
        if t.is_kw("create"):
            return self.parse_create()
        if t.is_kw("drop"):
            return self.parse_drop()
        if t.is_kw("insert"):
            return self.parse_insert()
        if t.is_kw("update"):
            return self.parse_update()
        if t.is_kw("delete"):
            return self.parse_delete()
        if t.is_kw("copy"):
            return self.parse_copy()
        if t.is_kw("quit"):
            self.next()
            return A.CommandStmt(command="\\q", line=t.line, column=t.column)
        raise self.err("expected a SQL statement")

    # ---------- SELECT ----------
    def parse_with_entries(self) -> List[A.WithEntry]:
        self.expect_kw("with")
        entries: List[A.WithEntry] = []
        while True:
            name = self.expect_ident()
            col_aliases: List[str] = []
            if self.accept_op("("):
                while True:
                    col_aliases.append(self.expect_ident())
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
            self.expect_kw("as")
            self.expect_op("(")
            q = self.parse_select()
            self.expect_op(")")
            entries.append(A.WithEntry(name=name, column_aliases=col_aliases,
                                       query=q))
            if not self.accept_op(","):
                break
        return entries

    def parse_select(self) -> A.SelectStmt:
        t = self.peek()
        with_entries: List[A.WithEntry] = []
        if self.at_kw("with"):
            with_entries = self.parse_with_entries()
        stmt = self.parse_select_body()
        stmt.with_entries = with_entries
        stmt.line, stmt.column = t.line, t.column
        # set operations, left-associative (flat chain, as in the reference grammar's
        # ParseSetOperation)
        while self.at_kw("union", "intersect", "except"):
            op = self.next().value
            if op == "union" and self.accept_kw("all"):
                op = "union_all"
            elif op == "union":
                self.accept_kw("distinct")
            rhs = self.parse_select_body_or_paren()
            # Reference grammar (SqlParser.ypp): each set-operation operand is a
            # full select_query carrying its own ORDER BY/LIMIT (see the
            # execution_generator Union.test LIMIT-per-branch case), so a
            # trailing ORDER BY binds to the last operand, not the whole union.
            stmt.set_ops.append((op, rhs))
        # trailing ORDER BY / LIMIT applying to the whole set operation
        # (reachable only when the last operand was parenthesized)
        if stmt.set_ops and self.at_kw("order"):
            stmt.set_order_by = self.parse_order_by()
        if stmt.set_ops and self.accept_kw("limit"):
            stmt.set_limit = int(self.next().value)
        return stmt

    def parse_select_body_or_paren(self) -> A.SelectStmt:
        if self.accept_op("("):
            s = self.parse_select()
            self.expect_op(")")
            return s
        return self.parse_select_body()

    def parse_select_body(self) -> A.SelectStmt:
        if self.at_op("("):
            return self.parse_select_body_or_paren()
        t = self.expect_kw("select")
        stmt = A.SelectStmt(line=t.line, column=t.column)
        if self.accept_kw("distinct"):
            stmt.distinct = True
        else:
            self.accept_kw("all")
        # select list
        while True:
            item = A.SelectItem()
            tok = self.peek()
            item.line, item.column = tok.line, tok.column
            if self.at_op("*"):
                self.next()
                item.expr = A.Star()
            else:
                item.expr = self.parse_expr()
                if self.accept_kw("as"):
                    item.alias = self.expect_ident()
                elif self.peek().kind == "ident":
                    item.alias = self.next().value
            stmt.select_list.append(item)
            if not self.accept_op(","):
                break
        # FROM
        if self.accept_kw("from"):
            while True:
                stmt.from_tables.append(self.parse_table_ref())
                if not self.accept_op(","):
                    break
        if self.accept_kw("where"):
            stmt.where = self.parse_expr()
        if self.accept_kw("group"):
            self.expect_kw("by")
            while True:
                stmt.group_by.append(self.parse_expr())
                if not self.accept_op(","):
                    break
        if self.accept_kw("having"):
            stmt.having = self.parse_expr()
        if self.accept_kw("window"):
            while True:
                wname = self.expect_ident()
                self.expect_kw("as")
                self.expect_op("(")
                spec = self.parse_window_spec()
                self.expect_op(")")
                spec.name = wname
                stmt.windows.append((wname, spec))
                if not self.accept_op(","):
                    break
        if self.at_kw("order"):
            stmt.order_by = self.parse_order_by()
        if self.accept_kw("limit"):
            tnum = self.next()
            if tnum.kind != "number":
                raise self.err("expected LIMIT count")
            stmt.limit = int(tnum.value)
        if self.accept_kw("with"):
            self.expect_kw("priority")
            self.expect_op("=")
            stmt.priority = int(self.next().value)
        return stmt

    def parse_order_by(self) -> List[A.OrderItem]:
        self.expect_kw("order")
        self.expect_kw("by")
        items = []
        while True:
            it = A.OrderItem()
            tok = self.peek()
            it.line, it.column = tok.line, tok.column
            it.expr = self.parse_expr()
            if self.accept_kw("asc"):
                it.ascending = True
            elif self.accept_kw("desc"):
                it.ascending = False
            if self.accept_kw("nulls"):
                if self.accept_kw("first"):
                    it.nulls_first = True
                else:
                    self.expect_kw("last")
                    it.nulls_first = False
            items.append(it)
            if not self.accept_op(","):
                break
        return items

    def parse_window_spec(self) -> A.WindowSpec:
        spec = A.WindowSpec()
        if self.accept_kw("partition"):
            self.expect_kw("by")
            while True:
                spec.partition_by.append(self.parse_expr())
                if not self.accept_op(","):
                    break
        if self.at_kw("order"):
            spec.order_by = self.parse_order_by()
        if self.at_kw("rows", "range"):
            frame = A.WindowFrame(mode=self.next().value)
            self.expect_kw("between")
            if self.accept_kw("unbounded"):
                self.expect_kw("preceding")
                frame.start_unbounded = True
            else:
                if self.accept_kw("current"):
                    self.expect_kw("row")
                    frame.start_unbounded = False
                    frame.start_offset = 0
                else:
                    n = int(self.next().value)
                    self.expect_kw("preceding")
                    frame.start_unbounded = False
                    frame.start_offset = n
            self.expect_kw("and")
            if self.accept_kw("unbounded"):
                self.expect_kw("following")
                frame.end_unbounded = True
            elif self.accept_kw("current"):
                self.expect_kw("row")
                frame.end_offset = 0
            else:
                n = int(self.next().value)
                self.expect_kw("following")
                frame.end_offset = n
            spec.frame = frame
        return spec

    # ---------- FROM / joins ----------
    def parse_table_ref(self) -> A.TableRef:
        left = self.parse_table_primary()
        while True:
            kind = None
            if self.accept_kw("join"):
                kind = "inner"
            elif self.at_kw("inner") and self.peek(1).is_kw("join"):
                self.next(); self.next()
                kind = "inner"
            elif self.at_kw("left", "right", "full"):
                kind = self.next().value
                self.accept_kw("outer")
                self.expect_kw("join")
            else:
                break
            right = self.parse_table_primary()
            cond = None
            if self.accept_kw("on"):
                cond = self.parse_expr()
            left = A.JoinRef(kind=kind, left=left, right=right, condition=cond)
        return left

    def parse_table_primary(self) -> A.TableRef:
        t = self.peek()
        if self.accept_op("("):
            sub = self.parse_select()
            self.expect_op(")")
            alias = None
            col_aliases: List[str] = []
            if self.accept_kw("as"):
                alias = self.expect_ident()
            elif self.peek().kind == "ident":
                alias = self.next().value
            if self.accept_op("("):
                while True:
                    col_aliases.append(self.expect_ident())
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
            return A.SubqueryTableRef(subquery=sub, alias=alias,
                                      column_aliases=col_aliases,
                                      line=t.line, column=t.column)
        name = self.expect_ident()
        # table generator function: name(args)
        if self.at_op("("):
            self.next()
            args: List[A.Expr] = []
            if not self.at_op(")"):
                while True:
                    args.append(self.parse_expr())
                    if not self.accept_op(","):
                        break
            self.expect_op(")")
            alias = None
            col_aliases = []
            if self.accept_kw("as"):
                alias = self.expect_ident()
            elif self.peek().kind == "ident":
                alias = self.next().value
            if alias is not None and self.accept_op("("):
                # AS gs(i): generator output column aliases
                while True:
                    col_aliases.append(self.expect_ident())
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
            return A.GeneratorTableRef(name=name, args=args, alias=alias,
                                       column_aliases=col_aliases,
                                       line=t.line, column=t.column)
        ref = A.BaseTableRef(name=name, line=t.line, column=t.column)
        if self.at_kw("blocksample", "tuplesample"):
            ref.sample_kind = self.next().value
            pct = self.next()
            ref.sample_percent = int(pct.value)
            self.expect_kw("percent")
        if self.accept_kw("as"):
            ref.alias = self.expect_ident()
        elif self.peek().kind == "ident":
            ref.alias = self.next().value
        return ref

    # ---------- expressions (Pratt) ----------
    def parse_expr(self) -> A.Expr:
        return self.parse_or()

    def parse_or(self) -> A.Expr:
        left = self.parse_and()
        while self.at_kw("or"):
            t = self.next()
            right = self.parse_and()
            left = A.BinaryExpr(op="OR", left=left, right=right,
                                line=t.line, column=t.column)
        return left

    def parse_and(self) -> A.Expr:
        left = self.parse_not()
        while self.at_kw("and"):
            t = self.next()
            right = self.parse_not()
            left = A.BinaryExpr(op="AND", left=left, right=right,
                                line=t.line, column=t.column)
        return left

    def parse_not(self) -> A.Expr:
        if self.at_kw("not"):
            t = self.next()
            return A.UnaryExpr(op="NOT", operand=self.parse_not(),
                               line=t.line, column=t.column)
        return self.parse_predicate()

    def parse_predicate(self) -> A.Expr:
        left = self.parse_additive()
        t = self.peek()
        # IS [NOT] NULL
        if self.at_kw("is"):
            self.next()
            negated = bool(self.accept_kw("not"))
            self.expect_kw("null")
            return A.IsNullExpr(operand=left, negated=negated,
                                line=t.line, column=t.column)
        negated = False
        if self.at_kw("not") and self.peek(1).kind == "keyword" and \
                self.peek(1).value in ("like", "between", "in", "regexp"):
            self.next()
            negated = True
        if self.at_kw("like", "regexp"):
            op = self.next().value
            right = self.parse_additive()
            node = A.BinaryExpr(op=("NOT_" if negated else "") + op.upper(),
                                left=left, right=right, line=t.line, column=t.column)
            return node
        if self.at_kw("between"):
            self.next()
            low = self.parse_additive()
            self.expect_kw("and")
            high = self.parse_additive()
            return A.BetweenExpr(operand=left, low=low, high=high, negated=negated,
                                 line=t.line, column=t.column)
        if self.at_kw("in"):
            self.next()
            self.expect_op("(")
            if self.at_kw("select") or self.at_kw("with"):
                sub = self.parse_select()
                self.expect_op(")")
                return A.InSubqueryExpr(operand=left, subquery=sub, negated=negated,
                                        line=t.line, column=t.column)
            items = []
            while True:
                items.append(self.parse_expr())
                if not self.accept_op(","):
                    break
            self.expect_op(")")
            return A.InListExpr(operand=left, items=items, negated=negated,
                                line=t.line, column=t.column)
        if self.peek().kind == "op" and self.peek().value in _CMP_OPS:
            op = self.next().value
            right = self.parse_additive()
            return A.BinaryExpr(op=op, left=left, right=right,
                                line=t.line, column=t.column)
        return left

    def parse_additive(self) -> A.Expr:
        left = self.parse_multiplicative()
        while self.at_op("+", "-"):
            t = self.next()
            right = self.parse_multiplicative()
            left = A.BinaryExpr(op=t.value, left=left, right=right,
                                line=t.line, column=t.column)
        return left

    def parse_multiplicative(self) -> A.Expr:
        left = self.parse_unary()
        while self.at_op("*", "/", "%"):
            t = self.next()
            right = self.parse_unary()
            left = A.BinaryExpr(op=t.value, left=left, right=right,
                                line=t.line, column=t.column)
        return left

    def parse_unary(self) -> A.Expr:
        if self.at_op("-"):
            t = self.next()
            return A.UnaryExpr(op="-", operand=self.parse_unary(),
                               line=t.line, column=t.column)
        if self.at_op("+"):
            self.next()
            return self.parse_unary()
        return self.parse_primary()

    def parse_primary(self) -> A.Expr:
        t = self.peek()
        # parenthesized expr or scalar subquery
        if self.at_op("("):
            self.next()
            if self.at_kw("select") or self.at_kw("with"):
                sub = self.parse_select()
                self.expect_op(")")
                return A.ScalarSubqueryExpr(subquery=sub, line=t.line, column=t.column)
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if t.kind == "number":
            self.next()
            return A.Literal(value=t.value, text=t.text,
                             line=t.line, column=t.column)
        if t.kind == "string":
            self.next()
            return A.Literal(value=t.value, line=t.line, column=t.column)
        if self.at_kw("null"):
            self.next()
            return A.Literal(value=None, line=t.line, column=t.column)
        if self.at_kw("true"):
            self.next()
            return A.Literal(value=1, line=t.line, column=t.column)
        if self.at_kw("false"):
            self.next()
            return A.Literal(value=0, line=t.line, column=t.column)
        # typed literals
        if self.at_kw("date") and self.peek(1).kind == "string":
            self.next()
            s = self.next()
            try:
                code = parse_date_literal(s.value)
            except ValueError as e:
                raise ParseError(str(e), s.line, s.column)
            return A.Literal(value=code, type_hint="date", text=str(s.value),
                             line=t.line, column=t.column)
        if self.at_kw("datetime", "timestamp") and self.peek(1).kind == "string":
            self.next()
            s = self.next()
            return A.Literal(value=parse_datetime_literal(s.value), type_hint="datetime",
                             text=str(s.value), line=t.line, column=t.column)
        if self.at_kw("interval"):
            self.next()
            s = self.next()
            if s.kind == "string":
                text = s.value
                # INTERVAL '3' MONTH  or  INTERVAL '3 month'
                if self.peek().kind == "keyword" and self.peek().value in (
                        "year", "month", "day", "hour", "minute", "second", "week"):
                    unit = self.next().value
                    text = f"{text} {unit}"
                kind, amount = parse_interval_literal(text)
            else:
                raise ParseError("expected INTERVAL literal string", s.line, s.column)
            return A.IntervalLiteral(kind=kind, amount=amount, text=text,
                                     line=t.line, column=t.column)
        if self.at_kw("case"):
            return self.parse_case()
        if self.at_kw("cast"):
            self.next()
            self.expect_op("(")
            operand = self.parse_expr()
            self.expect_kw("as")
            tname, tlen, tscale = self.parse_type_name()
            self.expect_op(")")
            return A.CastExpr(operand=operand, target_type_name=tname,
                              target_length=tlen, target_scale=tscale,
                              line=t.line, column=t.column)
        if self.at_kw("extract"):
            self.next()
            self.expect_op("(")
            field_tok = self.next()
            field = str(field_tok.value).lower()
            self.expect_kw("from")
            operand = self.parse_expr()
            self.expect_op(")")
            # the reference prints the unit uppercase in generated names
            # (ParseBasicExpressions.cpp ParseExtractFunction::generateName)
            return A.ExtractExpr(field=field, operand=operand,
                                 field_src=str(field_tok.value).upper(),
                                 line=t.line, column=t.column)
        if self.at_kw("substring"):
            self.next()
            self.expect_op("(")
            operand = self.parse_expr()
            if self.accept_kw("from"):
                start = self.parse_expr()
                length = None
                if self.accept_kw("for"):
                    length = self.parse_expr()
            else:
                self.expect_op(",")
                start = self.parse_expr()
                length = None
                if self.accept_op(","):
                    length = self.parse_expr()
            self.expect_op(")")
            return A.SubstringExpr(operand=operand, start=start, length=length,
                                   line=t.line, column=t.column)
        if self.at_kw("exists"):
            self.next()
            self.expect_op("(")
            sub = self.parse_select()
            self.expect_op(")")
            return A.ExistsExpr(subquery=sub, line=t.line, column=t.column)
        # identifier: column ref, qualified ref, or function call
        if t.kind == "ident" or (t.kind == "keyword" and t.value in (
                "year", "month", "day", "hour", "minute", "second", "left", "right",
                "date", "first", "last", "hash", "range", "row", "time")):
            name = self.next().value
            if self.at_op("("):
                return self.parse_function_call(str(name), t)
            if self.at_op("."):
                self.next()
                if self.at_op("*"):
                    self.next()
                    return A.Star(table=str(name), line=t.line, column=t.column)
                col = self.expect_ident()
                return A.ColumnRef(name=col, table=str(name),
                                   line=t.line, column=t.column)
            return A.ColumnRef(name=str(name), line=t.line, column=t.column)
        raise self.err("expected expression")

    def parse_function_call(self, name: str, t: Token) -> A.Expr:
        self.expect_op("(")
        fc = A.FunctionCall(name=name.lower(), src_name=name,
                            line=t.line, column=t.column)
        if self.at_op("*"):
            self.next()
            fc.is_star = True
        elif not self.at_op(")"):
            if self.accept_kw("distinct"):
                fc.distinct = True
            while True:
                fc.args.append(self.parse_expr())
                if not self.accept_op(","):
                    break
        self.expect_op(")")
        if self.accept_kw("over"):
            if self.at_op("("):
                self.next()
                fc.window = self.parse_window_spec()
                self.expect_op(")")
            else:
                wname = self.expect_ident()
                fc.window = A.WindowSpec(name=wname)
        return fc

    def parse_case(self) -> A.CaseExpr:
        t = self.expect_kw("case")
        node = A.CaseExpr(line=t.line, column=t.column)
        if not self.at_kw("when"):
            node.operand = self.parse_expr()
        while self.accept_kw("when"):
            cond = self.parse_expr()
            self.expect_kw("then")
            res = self.parse_expr()
            node.when_clauses.append((cond, res))
        if self.accept_kw("else"):
            node.else_result = self.parse_expr()
        self.expect_kw("end")
        return node

    # ---------- types ----------
    def parse_type_name(self):
        t = self.next()
        if t.kind not in ("keyword", "ident"):
            raise self.err("expected type name")
        name = str(t.value)
        length = 0
        nl = name.lower()
        if nl == "double" and self.peek().kind == "ident" and \
                self.peek().value.lower() == "precision":
            self.next()
        if nl == "character" and self.at_kw("varchar"):
            # CHARACTER VARYING is lexed as keyword varchar? no — accept "character
            # varying" via ident fallback below.
            pass
        if self.peek().kind == "ident" and self.peek().value.lower() == "varying":
            self.next()
            name, nl = "varchar", "varchar"
        scale = None
        if self.at_op("("):
            self.next()
            length = int(self.next().value)
            if self.accept_op(","):
                # DECIMAL(p, s): keep the scale — it selects the exact
                # scaled-integer storage encoding (types/types.py DECIMAL)
                scale = int(self.next().value)
            self.expect_op(")")
        return name, length, scale

    # ---------- DDL / DML ----------
    def parse_create(self) -> A.Statement:
        t = self.expect_kw("create")
        if self.accept_kw("table"):
            name = self.expect_ident()
            stmt = A.CreateTableStmt(name=name, line=t.line, column=t.column)
            self.expect_op("(")
            while True:
                cname = self.expect_ident()
                tname, tlen, tscale = self.parse_type_name()
                cd = A.ColumnDef(name=cname, type_name=str(tname),
                                 type_length=tlen, type_scale=tscale)
                while True:
                    if self.accept_kw("not"):
                        self.expect_kw("null")
                        cd.not_null = True
                    elif self.accept_kw("null"):
                        cd.nullable = True
                    elif self.accept_kw("unique"):
                        cd.unique = True
                    elif self.accept_kw("primary"):
                        self.expect_kw("key")
                        cd.unique = True
                        cd.not_null = True
                    else:
                        break
                stmt.columns.append(cd)
                if not self.accept_op(","):
                    break
            self.expect_op(")")
            # WITH BLOCKPROPERTIES (...)
            if self.accept_kw("with"):
                self.expect_kw("blockproperties")
                self.expect_op("(")
                while True:
                    key = self.next().value
                    val: object
                    tv = self.peek()
                    if tv.kind in ("number", "string"):
                        val = self.next().value
                    elif tv.kind in ("ident", "keyword"):
                        val = self.next().value
                        # e.g. SORT col  /  COMPRESS (a, b)
                        if self.at_op("("):
                            self.next()
                            lst = []
                            while True:
                                lst.append(self.next().value)
                                if not self.accept_op(","):
                                    break
                            self.expect_op(")")
                            val = (val, lst)
                    else:
                        raise self.err("expected BLOCKPROPERTIES value")
                    stmt.block_properties[str(key).lower()] = val
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
            if self.accept_kw("partition"):
                self.expect_kw("by")
                kind = self.next().value  # hash | range
                stmt.partition_kind = str(kind).lower()
                self.expect_op("(")
                while True:
                    ptok = self.peek()
                    stmt.partition_attrs.append(self.expect_ident())
                    stmt.partition_attr_pos.append((ptok.line, ptok.column))
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
                self.expect_kw("partitions")
                stmt.partition_count = int(self.next().value)
            return stmt
        if self.accept_kw("index"):
            iname = self.expect_ident()
            self.expect_kw("on")
            tname = self.expect_ident()
            stmt = A.CreateIndexStmt(index_name=iname, table_name=tname,
                                     line=t.line, column=t.column)
            if self.accept_op("("):
                while True:
                    stmt.attrs.append(self.expect_ident())
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
            if self.accept_kw("using"):
                stmt.index_type = str(self.next().value).lower()
            return stmt
        raise self.err("expected TABLE or INDEX after CREATE")

    def parse_drop(self) -> A.DropTableStmt:
        t = self.expect_kw("drop")
        self.expect_kw("table")
        name = self.expect_ident()
        return A.DropTableStmt(name=name, line=t.line, column=t.column)

    def parse_insert(self) -> A.InsertStmt:
        t = self.expect_kw("insert")
        self.expect_kw("into")
        name = self.expect_ident()
        stmt = A.InsertStmt(table_name=name, line=t.line, column=t.column)
        if self.accept_kw("values"):
            while True:
                self.expect_op("(")
                row = []
                while True:
                    row.append(self.parse_expr())
                    if not self.accept_op(","):
                        break
                self.expect_op(")")
                stmt.rows.append(row)
                if not self.accept_op(","):
                    break
        else:
            stmt.select = self.parse_select()
        return stmt

    def parse_update(self) -> A.UpdateStmt:
        t = self.expect_kw("update")
        name = self.expect_ident()
        self.expect_kw("set")
        stmt = A.UpdateStmt(table_name=name, line=t.line, column=t.column)
        while True:
            col = self.expect_ident()
            self.expect_op("=")
            stmt.assignments.append((col, self.parse_expr()))
            if not self.accept_op(","):
                break
        if self.accept_kw("where"):
            stmt.where = self.parse_expr()
        return stmt

    def parse_delete(self) -> A.DeleteStmt:
        t = self.expect_kw("delete")
        self.expect_kw("from")
        name = self.expect_ident()
        stmt = A.DeleteStmt(table_name=name, line=t.line, column=t.column)
        if self.accept_kw("where"):
            stmt.where = self.parse_expr()
        return stmt

    def parse_copy(self) -> A.CopyStmt:
        t = self.expect_kw("copy")
        name = ""
        select: Optional[A.SelectStmt] = None
        if self.at_kw("select", "with") or self.at_op("("):
            # COPY <query> TO ... (reference SqlParser.ypp copy_to_target)
            select = self.parse_select()
        else:
            name = self.expect_ident()
        direction_tok = self.next()
        if direction_tok.is_kw("from"):
            direction = "from"
        elif direction_tok.kind == "ident" and direction_tok.value.lower() == "to":
            direction = "to"
        else:
            # TO is not a keyword in our lexer: accept ident 'to'
            raise ParseError("expected FROM or TO in COPY", direction_tok.line,
                             direction_tok.column)
        if select is not None and direction != "to":
            raise ParseError("COPY <query> requires TO", direction_tok.line,
                             direction_tok.column)
        path_tok = self.next()
        if path_tok.kind != "string" and not path_tok.is_kw("stdout") and \
                not path_tok.is_kw("stderr"):
            raise ParseError("expected file path string", path_tok.line, path_tok.column)
        stmt = A.CopyStmt(table_name=name, direction=direction, select=select,
                          path=str(path_tok.value), line=t.line, column=t.column)
        if self.accept_kw("with"):
            self.expect_op("(")
            while True:
                key = str(self.next().value).lower()
                if self.peek().kind in ("string", "number") or \
                        self.at_kw("true", "false"):
                    v = self.next()
                    val = v.value if v.kind != "keyword" else (v.value == "true")
                else:
                    val = True
                stmt.options[key] = val
                if not self.accept_op(","):
                    break
            self.expect_op(")")
        return stmt


def parse_statements(text: str) -> List[A.Statement]:
    toks = tokenize(text)
    p = _Parser(toks, text)
    stmts = []
    while p.peek().kind != "eof":
        if p.accept_op(";"):
            continue
        stmt = p.parse_statement()
        stmts.append(stmt)
        if p.peek().kind != "eof" and not isinstance(stmt, A.CommandStmt):
            if not p.accept_op(";") and p.peek().kind != "command":
                raise p.err("expected ';'")
    return stmts


def parse_one(text: str) -> A.Statement:
    stmts = parse_statements(text)
    if len(stmts) != 1:
        raise ParseError(f"expected exactly one statement, got {len(stmts)}")
    return stmts[0]
