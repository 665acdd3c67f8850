"""Golden text-based tests (reference tier-2 analog: ExecutionGeneratorTestRunner /
OptimizerTextTestRunner over TestDatabaseLoader-style fixture data)."""

import glob
import os

import pytest

from quickstep_tpu import Database
from quickstep_tpu.utils.golden import run_golden_file

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def make_fixture_db() -> Database:
    """Deterministic fixture: 25 rows with NULLs in every other type
    (the reference's TestDatabaseLoader analog)."""
    db = Database()
    db.execute("""CREATE TABLE test (int_col INT, long_col BIGINT,
                  float_col FLOAT, double_col DOUBLE,
                  char_col CHAR(4), vchar_col VARCHAR(8))""")
    rows = []
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    for i in range(25):
        rows.append((
            "NULL" if i % 5 == 0 else str(i - 12),
            str(i * 100),
            "NULL" if i % 7 == 0 else f"{i * 0.5}",
            f"{i * 0.25}",
            f"'c{i % 3}'",
            "NULL" if i % 11 == 0 else f"'{words[i % 5]}'",
        ))
    db.execute("INSERT INTO test VALUES " +
               ", ".join(f"({', '.join(r)})" for r in rows))
    return db


@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(GOLDEN_DIR, "execute", "*.test"))))
def test_golden_execute(path):
    db = make_fixture_db()
    failures = run_golden_file(path, db, mode="execute",
                               update=bool(os.environ.get("UPDATE_GOLDEN")))
    assert not failures, "\n\n".join(failures)


@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(GOLDEN_DIR, "plan", "*.test"))))
def test_golden_plan(path):
    db = make_fixture_db()
    failures = run_golden_file(path, db, mode="plan",
                               update=bool(os.environ.get("UPDATE_GOLDEN")))
    assert not failures, "\n\n".join(failures)
