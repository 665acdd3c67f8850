"""Eviction policy tests (reference storage/tests/EvictionPolicy_unittest.cpp
analog): LRU-K scan resistance + policy factory + executor integration."""

import numpy as np
import pytest

from quickstep_tpu.storage.eviction import (EvictAnyPolicy, LRUKPolicy,
                                            UniformRandomPolicy, make_policy)


def test_lru1_is_classic_lru():
    p = LRUKPolicy(1)
    for key in ("a", "b", "c"):
        p.block_referenced(key)
    p.block_referenced("a")          # a is now most recent
    assert p.choose_victim(["a", "b", "c"]) == "b"


def test_lruk_scan_resistance():
    """A hot entry referenced twice survives over a newer one-touch scan."""
    p = LRUKPolicy(2)
    p.block_referenced("hot")
    p.block_referenced("hot")        # 2 references -> finite K-distance
    p.block_referenced("scan")       # 1 reference  -> infinite K-distance
    assert p.choose_victim(["hot", "scan"]) == "scan"
    # once both have K references, the oldest K-th-most-recent loses:
    # hot's refs are (1,2)->(2,4) after re-touch; scan's are (3,5)
    p.block_referenced("hot")        # hot: ticks (2, 4)
    p.block_referenced("scan")       # scan: ticks (3, 5)
    assert p.choose_victim(["hot", "scan"]) == "hot"


def test_factory():
    assert isinstance(make_policy("lru-k", k=2), LRUKPolicy)
    assert isinstance(make_policy("lru"), LRUKPolicy)
    assert isinstance(make_policy("uniform-random"), UniformRandomPolicy)
    assert isinstance(make_policy("evict-any"), EvictAnyPolicy)
    with pytest.raises(ValueError):
        make_policy("clock")


def test_executor_budget_eviction():
    """Under a tight HBM budget, faulting a third table evicts per policy and
    queries still work (re-fault on next use)."""
    from quickstep_tpu import Database
    from quickstep_tpu.config import Config
    db = Database(config=Config(hbm_budget_bytes=1, display_timing=False))
    for t in ("t1", "t2"):
        db.execute(f"CREATE TABLE {t} (a INT NOT NULL)")
        db.execute(f"INSERT INTO {t} VALUES (1), (2), (3)")
    assert db.execute("SELECT SUM(a) FROM t1").rows == [(6,)]
    assert db.execute("SELECT SUM(a) FROM t2").rows == [(6,)]
    # budget of 1 byte: at most one resident table at a time
    assert len(db.executor._device_cache) <= 1
    assert db.execute("SELECT SUM(a) FROM t1").rows == [(6,)]
