"""TPC-H correctness: every query row-exact (with float rounding) vs sqlite3
over identical generated data — the tier-2 golden-test analog (SURVEY.md §4.2;
the reference engine itself can't be built offline, sqlite is the oracle)."""

import math

import pytest

from quickstep_tpu import Database
from quickstep_tpu.bench.tpch import (
    TPCH_QUERIES, ORACLE_OVERRIDES, load_tpch, load_sqlite, to_sqlite_sql,
    with_tiebreak,
)

SCALE = 0.01


@pytest.fixture(scope="module")
def engines():
    db = Database()
    data = load_tpch(db, scale=SCALE, seed=0)
    conn = load_sqlite(data)
    return db, conn


def normalize(rows):
    out = []
    for r in rows:
        nr = []
        for v in r:
            if isinstance(v, float):
                nr.append(round(v, 2))
            elif v is None:
                nr.append(None)
            else:
                nr.append(v)
        out.append(tuple(nr))
    return out


def assert_rows_match(qnum, ours, oracle, ordered):
    if ordered:
        # raw values with isclose tolerance (rounding first can flip a .005
        # boundary when float summation order differs from the oracle's)
        assert len(ours) == len(oracle), \
            f"Q{qnum}: {len(ours)} rows vs oracle {len(oracle)}"
        for i, (a, b) in enumerate(zip(ours, oracle)):
            assert _row_eq(a, b), f"Q{qnum} row {i}: {a} != {b}"
    else:
        ours_n = normalize(ours)
        oracle_n = normalize(oracle)
        assert sorted(map(repr, ours_n)) == sorted(map(repr, oracle_n)), \
            f"Q{qnum} multiset mismatch"


def _row_eq(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-8, abs_tol=1e-6):
                return False
        elif isinstance(x, float) or isinstance(y, float):
            if x is None or y is None:
                return False
            if not math.isclose(float(x), float(y), rel_tol=1e-9,
                                abs_tol=1e-6):
                return False
        elif x != y:
            return False
    return True


@pytest.mark.parametrize("qnum", sorted(TPCH_QUERIES.keys()))
def test_tpch_query(engines, qnum):
    db, conn = engines
    sql = with_tiebreak(qnum, TPCH_QUERIES[qnum])
    ours = db.execute(sql).rows
    oracle_sql = with_tiebreak(qnum, ORACLE_OVERRIDES.get(qnum,
                                                          TPCH_QUERIES[qnum]))
    oracle = conn.execute(to_sqlite_sql(oracle_sql)).fetchall()
    ordered = "order by" in sql.lower()
    assert_rows_match(qnum, ours, oracle, ordered)
