"""Device-side presentation ORDER BY (SortRunGeneration/SortMergeRun analog).

Large results sort on device via a payload-carrying lax.sort and only the
presented rows cross the host link; small results keep the host lexsort.
The threshold is dropped here so both paths run on the same data and must
agree exactly (NULLS FIRST/LAST, DESC, LIMIT, strings via dict codes).
"""

import numpy as np

from quickstep_tpu import Database
from quickstep_tpu.storage.column import Column
from quickstep_tpu.storage.dictionary import Dictionary
from quickstep_tpu.storage.table import TableData
from quickstep_tpu.types import INT, DOUBLE, Decimal, VarChar


def _mkdb(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    db = Database()
    db.execute("CREATE TABLE s (k INT NOT NULL, x INT NULL, "
               "d DECIMAL(9,2) NOT NULL, f DECIMAL NOT NULL, "
               "name VARCHAR(8) NOT NULL)")
    rel = db.catalog.default_database.get_relation("s")
    x = rng.integers(0, 50, n)
    xv = rng.random(n) > 0.1
    strs = [f"n{v:03d}" for v in rng.integers(0, 100, n)]
    dct, codes = Dictionary.build(strs)
    rel.set_data(TableData({
        "k": Column(INT, np.arange(n, dtype=np.int32)),
        "x": Column(INT.with_nullable(), x.astype(np.int32), xv),
        "d": Column(Decimal(9, 2), rng.integers(-10000, 10000, n).astype(
            np.int32)),
        "f": Column(DOUBLE, rng.normal(size=n)),
        "name": Column(VarChar(8), codes, None, dct),
    }))
    rel.analyze()
    return db


SQLS = [
    "SELECT k, x, d, name FROM s ORDER BY x, d DESC, k LIMIT 50",
    "SELECT k, x, d FROM s ORDER BY x DESC NULLS LAST, k LIMIT 25",
    "SELECT k, x FROM s ORDER BY x ASC NULLS FIRST, k LIMIT 25",
    "SELECT k, f, name FROM s ORDER BY name, f DESC, k LIMIT 30",
    "SELECT k, d FROM s ORDER BY d, k",
]


def test_device_sort_matches_host():
    db = _mkdb()
    host, device = [], []
    for sql in SQLS:
        db.config.device_sort_threshold_rows = 1 << 60
        r = db.execute(sql)
        assert db.executor.last_sort_path == "host"
        host.append(r.rows)
        db.config.device_sort_threshold_rows = 1
        r = db.execute(sql)
        assert db.executor.last_sort_path == "device", sql
        device.append(r.rows)
    for sql, h, d in zip(SQLS, host, device):
        assert h == d, sql


def test_device_sort_with_aggregate():
    db = _mkdb()
    sql = ("SELECT x, count(*) AS c, sum(d) AS sd FROM s GROUP BY x "
           "ORDER BY sd DESC, x LIMIT 10")
    db.config.device_sort_threshold_rows = 1 << 60
    expected = db.execute(sql).rows
    db.config.device_sort_threshold_rows = 1
    got = db.execute(sql).rows
    assert db.executor.last_sort_path == "device"
    assert got == expected
