"""Text-based golden-test driver.

Format parity with the reference's TextBasedTestDriver
(utility/textbased_test/TextBasedTestDriver.{hpp,cpp}; example
query_optimizer/tests/execution_generator/Select.test:18-33):

    <input SQL>
    --
    <expected output>
    ==
    <next case...>

Runner modes mirror the reference's three harnesses: 'execute' prints result tables
(ExecutionGeneratorTestRunner analog), 'plan' prints the optimized plan tree
(OptimizerTextTestRunner analog). `update=True` rewrites expected sections from
actual output (the reference's --update_golden workflow).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from quickstep_tpu.database import Database
from quickstep_tpu.errors import QuickstepError, SqlError


@dataclasses.dataclass
class GoldenCase:
    sql: str
    expected: str
    line: int


def parse_golden_file(text: str) -> List[GoldenCase]:
    cases = []
    chunks = []
    cur: List[str] = []
    start_line = 0
    for i, line in enumerate(text.split("\n")):
        if line.strip() == "==":
            chunks.append((start_line, cur))
            cur = []
            start_line = i + 1
        else:
            cur.append(line)
    if any(l.strip() for l in cur):
        chunks.append((start_line, cur))
    for start, lines in chunks:
        sql_lines: List[str] = []
        exp_lines: List[str] = []
        in_expected = False
        for line in lines:
            if not in_expected and line.strip() == "--":
                in_expected = True
                continue
            (exp_lines if in_expected else sql_lines).append(line)
        sql = "\n".join(sql_lines).strip()
        if not sql:
            continue
        cases.append(GoldenCase(sql=sql, expected="\n".join(exp_lines).strip(),
                                line=start))
    return cases


def run_case(db: Database, case: GoldenCase, mode: str = "execute") -> str:
    """Actual output for one case."""
    try:
        if mode == "plan":
            from quickstep_tpu.parser import parse_one
            from quickstep_tpu.optimizer.resolver import Resolver
            from quickstep_tpu.optimizer.rules import optimize_plan
            plan = Resolver(db.catalog.default_database).resolve_select(
                parse_one(case.sql))
            plan = optimize_plan(plan, db.config,
                                 db.catalog.default_database)
            return plan.tree_string()
        out = []
        from quickstep_tpu.parser import parse_statements
        for stmt in parse_statements(case.sql):
            res = db.executor.execute_statement(stmt)
            if res.message:
                out.append(res.message)
            elif res.rows_affected is not None:
                out.append(f"{res.rows_affected} rows affected.")
            else:
                out.append(res.to_table())
        return "\n".join(out)
    except SqlError as e:
        return e.format(case.sql)
    except QuickstepError as e:
        return f"ERROR: {e}"


def run_golden_file(path: str, db: Database, mode: str = "execute",
                    update: bool = False) -> List[str]:
    """Run all cases; returns list of failure descriptions (empty = pass).
    update=True rewrites the file with actual outputs."""
    with open(path) as f:
        text = f.read()
    cases = parse_golden_file(text)
    failures = []
    actuals = []
    for case in cases:
        actual = run_case(db, case, mode)
        actuals.append(actual)
        if actual.strip() != case.expected.strip():
            failures.append(
                f"{path}:{case.line}: mismatch\n--- expected ---\n"
                f"{case.expected}\n--- actual ---\n{actual}")
    if update:
        parts = []
        for case, actual in zip(cases, actuals):
            parts.append(f"{case.sql}\n--\n{actual}\n")
        with open(path, "w") as f:
            f.write("==\n".join(parts))
        return []
    return failures
