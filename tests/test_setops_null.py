"""EXCEPT / INTERSECT / UNION with NULLs and cross-dictionary strings, plus
[NOT] IN subquery three-valued-logic semantics — all vs a sqlite3 oracle
(reference: SetOperation nodes query_optimizer/logical/SetOperation.hpp and
null-aware anti-join semantics)."""

import sqlite3

import pytest

from quickstep_tpu import Database


def _key(t):
    return tuple((v is None, v) for v in t)


@pytest.fixture(scope="module")
def db():
    db = Database()
    db.execute("CREATE TABLE p (x INT, s VARCHAR(8))")
    db.execute("CREATE TABLE q (x INT, s VARCHAR(8))")
    db.execute("CREATE TABLE t (x INT)")
    db.execute("CREATE TABLE s (y INT)")
    db.execute("CREATE TABLE s2 (y INT)")
    db.execute("CREATE TABLE se (y INT)")
    db.execute("INSERT INTO p VALUES (1,'a'), (2,'b'), (2,'b'), (NULL,'c'), (3,NULL)")
    db.execute("INSERT INTO q VALUES (2,'b'), (NULL,'c'), (9,'z')")
    db.execute("INSERT INTO t VALUES (1), (2), (NULL), (4)")
    db.execute("INSERT INTO s VALUES (2), (NULL)")
    db.execute("INSERT INTO s2 VALUES (2), (3)")
    return db


@pytest.fixture(scope="module")
def oracle():
    c = sqlite3.connect(":memory:")
    c.execute("CREATE TABLE p (x INT, s TEXT)")
    c.execute("CREATE TABLE q (x INT, s TEXT)")
    c.execute("CREATE TABLE t (x INT)")
    c.execute("CREATE TABLE s (y INT)")
    c.execute("CREATE TABLE s2 (y INT)")
    c.execute("CREATE TABLE se (y INT)")
    c.executemany("INSERT INTO p VALUES (?,?)",
                  [(1, 'a'), (2, 'b'), (2, 'b'), (None, 'c'), (3, None)])
    c.executemany("INSERT INTO q VALUES (?,?)",
                  [(2, 'b'), (None, 'c'), (9, 'z')])
    c.executemany("INSERT INTO t VALUES (?)", [(1,), (2,), (None,), (4,)])
    c.executemany("INSERT INTO s VALUES (?)", [(2,), (None,)])
    c.executemany("INSERT INTO s2 VALUES (?)", [(2,), (3,)])
    return c


QUERIES = [
    "SELECT x, s FROM p EXCEPT SELECT x, s FROM q",
    "SELECT x, s FROM p INTERSECT SELECT x, s FROM q",
    "SELECT x, s FROM p UNION SELECT x, s FROM q",
    # NOT IN with an inner NULL filters everything; IN matches normally
    "SELECT x FROM t WHERE x NOT IN (SELECT y FROM s)",
    "SELECT x FROM t WHERE x IN (SELECT y FROM s)",
    # no inner NULLs: NULL operand still never passes
    "SELECT x FROM t WHERE x NOT IN (SELECT y FROM s2)",
    "SELECT x FROM t WHERE x IN (SELECT y FROM s2)",
    # empty inner side: NOT IN passes everything (even the NULL operand)
    "SELECT x FROM t WHERE x NOT IN (SELECT y FROM se)",
    "SELECT x FROM t WHERE x IN (SELECT y FROM se)",
]


@pytest.mark.parametrize("q", QUERIES)
def test_vs_sqlite(db, oracle, q):
    got = sorted(db.execute(q).rows, key=_key)
    want = sorted(oracle.execute(q).fetchall(), key=_key)
    assert got == want, (got, want)
