"""Run the reference engine's end-to-end golden corpus verbatim.

Reference harness: ExecutionGeneratorTestRunner
(query_optimizer/tests/ExecutionGeneratorTestRunner.cpp:90-215) — a fresh
database with the 25-row `test` relation per file; statements run in order;
SELECT output printed PrintToScreen-style and compared byte-exactly.
"""

import os

import pytest

from quickstep_tpu import Database
from quickstep_tpu.utils.golden import outputs_match, parse_golden_file, run_case
from quickstep_tpu.utils.testdb import load_test_relation

HERE = os.path.join(os.path.dirname(__file__), "golden", "reference")

FILES = sorted(f for f in os.listdir(HERE) if f.endswith(".test"))

# Cases that cannot pass verbatim, with reasons (documented exceptions).
SKIP_CASES = {
}


@pytest.mark.parametrize("fname", FILES)
def test_reference_golden_file(fname):
    path = os.path.join(HERE, fname)
    with open(path) as f:
        cases = parse_golden_file(f.read())
    db = Database()
    load_test_relation(db)
    failures = []
    for i, case in enumerate(cases):
        key = (fname, i)
        if key in SKIP_CASES:
            continue
        actual = run_case(db, case)
        if not outputs_match(actual, case.expected, case.sql):
            failures.append(
                f"{fname} case {i} (line {case.line}):\n--- sql ---\n{case.sql}"
                f"\n--- expected ---\n{case.expected}\n--- actual ---\n{actual}")
    assert not failures, f"{len(failures)} mismatches\n" + "\n\n".join(failures)
