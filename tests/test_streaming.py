"""Out-of-core streamed execution (>HBM working sets) + SMA segment pruning.

Reference capability: the buffer pool runs data sets larger than RAM
(storage/StorageManager.hpp:84, README.md:8); SMA indexes skip blocks whose
min/max cannot satisfy the predicate (storage/SMAIndexSubBlock.hpp:181).
Here: a tiny hbm_budget_bytes forces segment streaming; results must match
the unconstrained run."""

import numpy as np
import pytest

from quickstep_tpu import Database
from quickstep_tpu.config import Config


def _mkdb(budget=0):
    cfg = Config()
    cfg.display_timing = False
    cfg.hbm_budget_bytes = budget
    db = Database(config=cfg)
    db.execute("CREATE TABLE dim (k INT NOT NULL, name VARCHAR(8) NOT NULL)")
    db.execute("INSERT INTO dim VALUES " + ", ".join(
        f"({k}, 'd{k % 5}')" for k in range(1, 17)))
    db.execute("CREATE TABLE big (k INT NOT NULL, g INT NOT NULL, "
               "v DOUBLE NOT NULL, seq INT NOT NULL)")
    rows = []
    x = 7
    for i in range(20000):
        x = (x * 1103515245 + 12345) % (1 << 31)
        rows.append(f"({1 + x % 16}, {x % 3}, {(x % 1000) / 10.0}, {i})")
        if len(rows) == 5000:
            db.execute("INSERT INTO big VALUES " + ", ".join(rows))
            rows = []
    db.execute("\\analyze")
    return db


# big table bytes: 20k rows x (4 + 4 + 8 + 4 + padding) ~ 480KB.
BUDGET = 200_000   # forces ~4+ segments


@pytest.fixture(scope="module")
def dbs():
    return _mkdb(), _mkdb(budget=BUDGET)


QUERIES = [
    # Q6-class scalar aggregate
    "SELECT SUM(v), COUNT(*), MIN(v), MAX(v), AVG(v) FROM big WHERE g < 2",
    # Q1-class group aggregate
    "SELECT g, COUNT(*), SUM(v), AVG(v) FROM big GROUP BY g ORDER BY g",
    # probe-side streaming join, build side resident
    "SELECT d.name, SUM(b.v) FROM big b, dim d WHERE b.k = d.k "
    "GROUP BY d.name ORDER BY d.name",
    # selective scan (SMA prunable on the clustered seq column)
    "SELECT COUNT(*), SUM(v) FROM big WHERE seq < 1000",
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_streamed_matches_resident(dbs, qi):
    full, streamed = dbs
    q = QUERIES[qi]
    a = full.execute(q).rows
    b = streamed.execute(q).rows
    info = streamed.executor.last_stream_info
    assert info is not None and info["segments"] > 1, \
        "query did not take the streamed path"
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        for x, y in zip(ra, rb):
            if isinstance(x, float):
                assert abs(x - y) <= 1e-9 * max(1.0, abs(x))
            else:
                assert x == y


def test_sma_pruning_skips_segments(dbs):
    _, streamed = dbs
    # seq is monotone, so seq < 1000 falls entirely in the first segment(s):
    # SMA min/max must prune the rest without touching the device
    streamed.execute("SELECT COUNT(*) FROM big WHERE seq < 1000")
    info = streamed.executor.last_stream_info
    assert info["segments_run"] < info["segments"], \
        f"no segments pruned: {info}"
    # and the result is still exact
    r = streamed.execute("SELECT COUNT(*) FROM big WHERE seq < 1000")
    assert r.rows == [(1000,)]


def test_streamed_bytes_accounted(dbs):
    _, streamed = dbs
    streamed.execute("SELECT SUM(v) FROM big")
    info = streamed.executor.last_stream_info
    assert info["bytes_streamed"] > 0
    assert streamed.executor.last_scan_bytes >= info["bytes_streamed"]
