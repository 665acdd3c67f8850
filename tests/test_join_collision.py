"""Hash-packed composite join keys must never mis-join on collisions.

The expansion join packs composite keys into one int64; when plan-time ranges
are unknown it falls back to a non-injective hash, and the probe must then
verify the actual key columns on every candidate pair (the reference checks
key equality in every hash-table probe loop, storage/HashTable.hpp). The
`test_weak_hash_join` config hook replaces the packing with `sum(keys) % 3`
so nearly every pair collides — correctness here proves the verify-gather.
"""

import pytest

from quickstep_tpu import Database


def _mkdb():
    db = Database()
    db.config.test_weak_hash_join = True
    # stop the planner from choosing the (already-verifying) unique-join path:
    # build sides below carry duplicate composite keys
    db.execute("CREATE TABLE probe (a INT NOT NULL, b INT NOT NULL, "
               "pv INT NOT NULL)")
    db.execute("CREATE TABLE build (a INT NOT NULL, b INT NOT NULL, "
               "bv INT NOT NULL)")
    db.execute("INSERT INTO probe VALUES (1, 1, 10), (1, 2, 11), (2, 1, 12), "
               "(4, 7, 13), (5, 0, 14), (9, 9, 15)")
    # (1,1) duplicated; (2,0) collides with (1,1) under sum%3; (0,2), (3,6)
    # collide with (1,1)/(4,7) trails too
    db.execute("INSERT INTO build VALUES (1, 1, 100), (1, 1, 101), "
               "(2, 0, 102), (0, 2, 103), (4, 7, 104), (3, 6, 105), "
               "(5, 1, 106)")
    return db


def _expected_inner():
    probe = [(1, 1, 10), (1, 2, 11), (2, 1, 12), (4, 7, 13), (5, 0, 14),
             (9, 9, 15)]
    build = [(1, 1, 100), (1, 1, 101), (2, 0, 102), (0, 2, 103), (4, 7, 104),
             (3, 6, 105), (5, 1, 106)]
    out = []
    for pa, pb, pv in probe:
        for ba, bb, bv in build:
            if pa == ba and pb == bb:
                out.append((pv, bv))
    return sorted(out)


def test_inner_join_with_colliding_pack():
    db = _mkdb()
    res = db.execute("SELECT pv, bv FROM probe, build "
                     "WHERE probe.a = build.a AND probe.b = build.b "
                     "ORDER BY pv, bv")
    assert [tuple(r) for r in res.rows] == _expected_inner()


def test_semi_anti_with_colliding_pack():
    db = _mkdb()
    semi = db.execute(
        "SELECT pv FROM probe WHERE EXISTS (SELECT * FROM build "
        "WHERE build.a = probe.a AND build.b = probe.b) ORDER BY pv")
    assert [r[0] for r in semi.rows] == [10, 13]
    anti = db.execute(
        "SELECT pv FROM probe WHERE NOT EXISTS (SELECT * FROM build "
        "WHERE build.a = probe.a AND build.b = probe.b) ORDER BY pv")
    assert [r[0] for r in anti.rows] == [11, 12, 14, 15]


def test_left_and_full_join_with_colliding_pack():
    db = _mkdb()
    left = db.execute(
        "SELECT pv, bv FROM probe LEFT OUTER JOIN build "
        "ON probe.a = build.a AND probe.b = build.b AND bv <> 101 "
        "ORDER BY pv, bv")
    got = [tuple(r) for r in left.rows]
    assert got == [(10, 100), (11, None), (12, None), (13, 104),
                   (14, None), (15, None)]
    full = db.execute(
        "SELECT pv, bv FROM probe FULL OUTER JOIN build "
        "ON probe.a = build.a AND probe.b = build.b AND pv <> 9999 "
        "ORDER BY pv, bv")
    got = [tuple(r) for r in full.rows]
    matched = [(10, 100), (10, 101), (13, 104)]
    probe_only = [(11, None), (12, None), (14, None), (15, None)]
    build_only = [(None, 102), (None, 103), (None, 105), (None, 106)]
    assert sorted(got, key=lambda t: (t[0] is None, t)) == \
        sorted(matched + probe_only + build_only,
               key=lambda t: (t[0] is None, t))
