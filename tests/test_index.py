"""CREATE INDEX: block SMA summaries are built eagerly, persisted with the
catalog, self-refresh after DML, and feed the streaming segment pruner
(reference: storage/SMAIndexSubBlock.hpp:181, parser CREATE INDEX ...
USING {SMA|CSBTREE})."""

import numpy as np
import pytest

from quickstep_tpu import Database
from quickstep_tpu.catalog.catalog import build_sma_blocks, sma_range_for
from quickstep_tpu.errors import ExecutionError, SqlError


def _make_db():
    db = Database()
    db.execute("CREATE TABLE t (k INT NOT NULL, v DOUBLE NOT NULL)")
    db.execute("INSERT INTO t VALUES " +
               ", ".join(f"({i}, {i * 0.5})" for i in range(100)))
    return db


def test_create_index_builds_sma():
    db = _make_db()
    res = db.execute("CREATE INDEX ik ON t (k) USING SMA")
    assert "created" in res.message
    rel = db.catalog.default_database.get_relation("t")
    assert "k" in rel.sma_blocks
    brows, mins, maxs, ver = rel.sma_blocks["k"]
    assert ver == rel.version
    assert mins[0] == 0 and maxs[-1] == 99
    assert sma_range_for(rel, "k", 10, 20) == (0, 99) or \
        sma_range_for(rel, "k", 10, 20)[0] <= 10  # single block at this size


def test_create_index_unknown_column_errors():
    db = _make_db()
    with pytest.raises((ExecutionError, SqlError)):
        db.execute("CREATE INDEX ik ON t (nope) USING SMA")


def test_duplicate_index_rejected():
    db = _make_db()
    db.execute("CREATE INDEX ik ON t (k) USING SMA")
    with pytest.raises((ExecutionError, SqlError)):
        db.execute("CREATE INDEX ik2 ON t (k) USING SMA")


def test_sma_refreshes_after_dml():
    db = _make_db()
    db.execute("CREATE INDEX ik ON t (k) USING SMA")
    rel = db.catalog.default_database.get_relation("t")
    db.execute("INSERT INTO t VALUES (1000, 1.0)")
    # version moved; the summary refreshes on next use and sees the new max
    r = sma_range_for(rel, "k", 0, rel.data.num_rows)
    assert r[1] == 1000
    assert rel.sma_blocks["k"][3] == rel.version


def test_block_granularity_ranges():
    db = Database()
    db.execute("CREATE TABLE big (k INT NOT NULL)")
    db.execute("INSERT INTO big VALUES " +
               ", ".join(f"({i})" for i in range(300)))
    rel = db.catalog.default_database.get_relation("big")
    build_sma_blocks(rel, "k", block_rows=64)
    brows, mins, maxs, _ = rel.sma_blocks["k"]
    assert brows == 64
    assert list(mins[:2]) == [0, 64] and maxs[0] == 63
    # last partial block: edge padding must not widen the range
    assert maxs[-1] == 299
    assert sma_range_for(rel, "k", 64, 128) == (64, 127)
    assert sma_range_for(rel, "k", 60, 70) == (0, 127)


def test_index_persists_across_save_load(tmp_path):
    db = _make_db()
    db.execute("CREATE INDEX ik ON t (k) USING SMA")
    db.config.storage_path = str(tmp_path / "store")
    db.save()
    db2 = Database(storage_path=str(tmp_path / "store"))
    rel = db2.catalog.default_database.get_relation("t")
    assert any(ix["name"] == "ik" for ix in rel.indices)
    assert "k" in rel.sma_blocks
    assert sma_range_for(rel, "k", 0, rel.data.num_rows) == (0, 99)


def test_streaming_pruner_uses_index():
    """A streamed scan with a selective predicate prunes segments using the
    persisted block summary (no full-column host scan needed)."""
    db = Database()
    db.execute("CREATE TABLE s (k INT NOT NULL, v DOUBLE NOT NULL)")
    db.execute("INSERT INTO s VALUES " +
               ", ".join(f"({i}, {float(i)})" for i in range(4000)))
    rel = db.catalog.default_database.get_relation("s")
    build_sma_blocks(rel, "k", block_rows=8)
    # force out-of-core streaming with a tiny HBM budget
    db.config.hbm_budget_bytes = 16 * 1024
    res = db.execute("SELECT sum(v) FROM s WHERE k >= 3900")
    assert res.rows[0][0] == float(sum(range(3900, 4000)))
    info = db.executor.last_stream_info
    assert info is not None and info["segments"] > 1
    assert info["segments_run"] < info["segments"]
