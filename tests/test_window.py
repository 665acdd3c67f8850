"""Window aggregate tests vs sqlite (which supports window functions)."""

import sqlite3

import pytest

from quickstep_tpu import Database


@pytest.fixture(scope="module")
def dbs():
    db = Database()
    db.execute("CREATE TABLE w (g INT NOT NULL, o INT NOT NULL, v DOUBLE NOT NULL)")
    rows = [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 5.0),
            (2, 2, 15.0), (1, 3, 40.0), (3, 1, 7.0)]
    db.execute("INSERT INTO w VALUES " +
               ", ".join(f"({g},{o},{v})" for g, o, v in rows))
    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE w (g INTEGER, o INTEGER, v REAL)")
    conn.executemany("INSERT INTO w VALUES (?,?,?)", rows)
    return db, conn


def run_both(dbs, sql):
    db, conn = dbs
    ours = sorted(map(repr, db.execute(sql).rows))
    oracle = sorted(map(repr, conn.execute(sql).fetchall()))
    assert ours == oracle


def test_partition_total(dbs):
    run_both(dbs, "SELECT g, o, sum(v) OVER (PARTITION BY g) FROM w")


def test_running_sum(dbs):
    # RANGE UNBOUNDED..CURRENT (peers share values: two (1,3) rows)
    run_both(dbs, "SELECT g, o, sum(v) OVER (PARTITION BY g ORDER BY o) FROM w")


def test_running_count_avg(dbs):
    run_both(dbs, "SELECT g, count(*) OVER (PARTITION BY g ORDER BY o), "
                  "avg(v) OVER (PARTITION BY g ORDER BY o) FROM w")


def test_rows_frame(dbs):
    run_both(dbs, "SELECT g, o, sum(v) OVER (PARTITION BY g ORDER BY o "
                  "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM w")


def test_min_max_partition(dbs):
    run_both(dbs, "SELECT g, min(v) OVER (PARTITION BY g), "
                  "max(v) OVER (PARTITION BY g) FROM w")


def test_running_min(dbs):
    run_both(dbs, "SELECT g, o, min(v) OVER (PARTITION BY g ORDER BY o) FROM w")


def test_no_partition(dbs):
    run_both(dbs, "SELECT o, sum(v) OVER (ORDER BY o) FROM w")


def test_range_frame_bounded(dbs):
    run_both(dbs, "SELECT g, o, sum(v) OVER (PARTITION BY g ORDER BY o "
                  "RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) FROM w")


def test_range_frame_current(dbs):
    run_both(dbs, "SELECT g, o, count(v) OVER (PARTITION BY g ORDER BY o "
                  "RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) FROM w")


def test_range_frame_unbounded_start(dbs):
    run_both(dbs, "SELECT g, o, avg(v) OVER (PARTITION BY g ORDER BY o "
                  "RANGE BETWEEN UNBOUNDED PRECEDING AND 3 FOLLOWING) FROM w")


def test_range_frame_min(dbs):
    run_both(dbs, "SELECT g, o, min(v) OVER (PARTITION BY g ORDER BY o "
                  "RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) FROM w")


def test_rows_frame_minmax(dbs):
    run_both(dbs, "SELECT g, o, max(v) OVER (PARTITION BY g ORDER BY o "
                  "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), "
                  "min(v) OVER (PARTITION BY g ORDER BY o "
                  "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) FROM w")


def test_range_frame_desc(dbs):
    run_both(dbs, "SELECT g, o, sum(v) OVER (PARTITION BY g ORDER BY o DESC "
                  "RANGE BETWEEN 2 PRECEDING AND 1 FOLLOWING), "
                  "max(v) OVER (PARTITION BY g ORDER BY o DESC "
                  "RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) FROM w")


def test_range_frame_1m_rows_merge_path():
    """RANGE frames at 1M rows ride merge_starts (not binary search): spot-
    check correctness against a numpy reference on sampled rows."""
    import numpy as np
    import jax.numpy as jnp
    from quickstep_tpu.ops.window import window_aggregate
    rng = np.random.default_rng(7)
    n = 1_000_000
    part = rng.integers(0, 50, n).astype(np.int32)
    val = rng.integers(0, 100_000, n).astype(np.int32)
    x = rng.integers(-100, 100, n).astype(np.int64)
    res, _ = window_aggregate(
        [jnp.asarray(part)], [jnp.asarray(val)], [False], "sum",
        jnp.asarray(x), None, jnp.ones((n,), bool), ("range", 500, 500))
    res = np.asarray(res)
    for i in rng.integers(0, n, 12):
        m = (part == part[i]) & (val >= val[i] - 500) & (val <= val[i] + 500)
        assert res[i] == x[m].sum(), i
