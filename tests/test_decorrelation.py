"""General (non-equality) correlated-subquery decorrelation — the
UnnestSubqueries general path (reference query_optimizer/rules/
UnnestSubqueries.cpp): theta-correlated EXISTS and correlated scalar
aggregates with </>/<> correlation plan and run instead of raising.
Results are checked against an in-memory sqlite oracle."""

import sqlite3

import pytest

from quickstep_tpu import Database


@pytest.fixture(scope="module")
def engines():
    db = Database()
    db.execute("CREATE TABLE emp (id INT NOT NULL, dept INT NOT NULL, "
               "salary INT NOT NULL)")
    db.execute("CREATE TABLE cap (dept INT NOT NULL, lim INT NOT NULL)")
    rows = [(i, i % 5, 100 * (i % 13) + i % 7) for i in range(1, 61)]
    caps = [(d, 400 + 100 * d) for d in range(5)] + [(7, 100)]
    db.execute("INSERT INTO emp VALUES " +
               ", ".join(f"({a}, {b}, {c})" for a, b, c in rows))
    db.execute("INSERT INTO cap VALUES " +
               ", ".join(f"({a}, {b})" for a, b in caps))
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE emp (id INT, dept INT, salary INT)")
    con.execute("CREATE TABLE cap (dept INT, lim INT)")
    con.executemany("INSERT INTO emp VALUES (?,?,?)", rows)
    con.executemany("INSERT INTO cap VALUES (?,?)", caps)
    return db, con


def check(engines, sql):
    db, con = engines
    ours = db.execute(sql).rows
    oracle = [tuple(r) for r in con.execute(sql).fetchall()]
    assert ours == oracle, f"{sql}\nours={ours[:5]}...\noracle={oracle[:5]}..."
    return ours


def test_exists_theta_correlation(engines):
    # EXISTS correlated ONLY via < (no equality): nested-loops semi join
    rows = check(engines, "SELECT id FROM emp WHERE EXISTS "
                          "(SELECT 1 FROM cap WHERE cap.lim < emp.salary) "
                          "ORDER BY id")
    assert rows  # non-trivial


def test_not_exists_theta_correlation(engines):
    check(engines, "SELECT id FROM emp WHERE NOT EXISTS "
                   "(SELECT 1 FROM cap WHERE cap.lim > emp.salary) "
                   "ORDER BY id")


def test_exists_uncorrelated(engines):
    rows = check(engines, "SELECT id FROM emp WHERE EXISTS "
                          "(SELECT 1 FROM cap WHERE lim > 600) ORDER BY id")
    assert len(rows) == 60


def test_scalar_agg_theta_correlation(engines):
    # correlated scalar aggregate with < correlation (no equality):
    # avg salary over strictly-poorer employees
    check(engines,
          "SELECT id, salary FROM emp e WHERE salary > "
          "(SELECT AVG(salary) FROM emp e2 WHERE e2.salary < e.salary) "
          "ORDER BY id")


def test_scalar_agg_mixed_eq_and_theta(engines):
    # equality on dept AND < on id: the general path (eq keys + residual)
    check(engines,
          "SELECT id FROM emp e WHERE salary >= "
          "(SELECT MAX(salary) FROM emp e2 WHERE e2.dept = e.dept "
          "AND e2.id < e.id) ORDER BY id")


def test_scalar_count_star_theta(engines):
    # COUNT(*) over a theta-correlated set: empty sets must count 0, not NULL
    check(engines,
          "SELECT id, (SELECT COUNT(*) FROM cap WHERE cap.lim < emp.salary) "
          "FROM emp ORDER BY id")


def test_scalar_sum_theta_empty_is_null(engines):
    check(engines,
          "SELECT id, (SELECT SUM(lim) FROM cap WHERE cap.lim < emp.salary) "
          "FROM emp ORDER BY id")
