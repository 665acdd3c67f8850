"""FULL OUTER JOIN execution (reference kLeftOuterJoin +
BuildAggregationExistenceMapOperator existence-bitmap analog,
relational_operators/HashJoinOperator.hpp:68-72) vs a sqlite3 oracle."""

import sqlite3

import pytest

from quickstep_tpu import Database


def _norm(rows):
    return sorted((tuple(r) for r in rows),
                  key=lambda t: tuple((v is None, v) for v in t))


@pytest.fixture(scope="module")
def db():
    db = Database()
    db.execute("CREATE TABLE a (k INT NOT NULL, x INT NOT NULL)")
    db.execute("CREATE TABLE b (k INT NOT NULL, y INT NOT NULL)")
    db.execute("CREATE TABLE u (k INT NOT NULL UNIQUE, z INT NOT NULL)")
    db.execute("INSERT INTO a VALUES (1, 10), (2, 20), (3, 30), (3, 31)")
    db.execute("INSERT INTO b VALUES (2, 200), (3, 300), (4, 400), (4, 401)")
    db.execute("INSERT INTO u VALUES (3, 7), (4, 8), (5, 9)")
    return db


@pytest.fixture(scope="module")
def oracle():
    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE a (k INT, x INT)")
    conn.execute("CREATE TABLE b (k INT, y INT)")
    conn.execute("CREATE TABLE u (k INT, z INT)")
    conn.executemany("INSERT INTO a VALUES (?,?)",
                     [(1, 10), (2, 20), (3, 30), (3, 31)])
    conn.executemany("INSERT INTO b VALUES (?,?)",
                     [(2, 200), (3, 300), (4, 400), (4, 401)])
    conn.executemany("INSERT INTO u VALUES (?,?)", [(3, 7), (4, 8), (5, 9)])
    return conn


QUERIES = [
    # expansion path (duplicate keys both sides)
    "SELECT a.k, a.x, b.k, b.y FROM a FULL OUTER JOIN b ON a.k = b.k",
    # residual participates in matching
    "SELECT a.k, b.y FROM a FULL JOIN b ON a.k = b.k AND b.y < 350",
    # unique build side
    "SELECT a.k, a.x, u.z FROM a FULL JOIN u ON a.k = u.k",
    # aggregate over a full join
    "SELECT count(*), count(a.k), count(b.k) FROM a FULL JOIN b ON a.k = b.k",
]


@pytest.mark.parametrize("q", QUERIES)
def test_full_join_vs_sqlite(db, oracle, q):
    got = _norm(db.execute(q).rows)
    want = _norm(oracle.execute(q).fetchall())
    assert got == want, (got, want)
