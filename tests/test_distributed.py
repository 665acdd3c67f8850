"""Distributed execution tests: the same queries over an 8-device CPU mesh
produce identical results to single-device runs — the reference's
"3 Executor instances in one process" test pattern
(DistributedExecutionGeneratorTestRunner, SURVEY.md §4.3) mapped to a virtual mesh."""

import pytest

from quickstep_tpu import Database
from quickstep_tpu.config import Config
from quickstep_tpu.bench.tpch import TPCH_QUERIES, load_tpch


@pytest.fixture(scope="module")
def pair():
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    single = Database()
    load_tpch(single, scale=0.005, seed=0)
    cfg = Config()
    cfg.distributed = True
    cfg.replicate_threshold_rows = 2000   # lineitem/orders shard, dims replicate
    dist = Database(config=cfg)
    load_tpch(dist, scale=0.005, seed=0)
    assert dist.executor.mesh is not None
    return single, dist


@pytest.mark.parametrize("qnum", list(range(1, 23)))
def test_distributed_matches_single(pair, qnum):
    single, dist = pair
    a = single.execute(TPCH_QUERIES[qnum]).rows
    b = dist.execute(TPCH_QUERIES[qnum]).rows
    assert len(a) == len(b), f"Q{qnum}: {len(a)} vs {len(b)} rows"
    for ra, rb in zip(a, b):
        assert len(ra) == len(rb)
        for x, y in zip(ra, rb):
            if isinstance(x, float) and isinstance(y, float):
                assert abs(x - y) <= 1e-6 * max(1.0, abs(x)), f"Q{qnum}"
            else:
                assert x == y, f"Q{qnum}: {ra} vs {rb}"


def test_distributed_dml(pair):
    _, dist = pair
    dist.execute("CREATE TABLE dd (a INT NOT NULL)")
    dist.execute("INSERT INTO dd VALUES (1), (2), (3)")
    assert dist.execute("SELECT sum(a) FROM dd").rows == [(6,)]
    dist.execute("DROP TABLE dd")
