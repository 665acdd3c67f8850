"""Worker process for the multi-host test (spawned by test_multihost.py).

Usage: python multihost_worker.py <proc_id> <n_procs> <port> <out_json> [tpch_sf]

Each process: bootstrap jax.distributed (CPU backend, 2 local devices), build an
identical database (the CatalogDatabaseCache analog — same catalog on every
node), run the battery through the full engine in distributed mode, and
(process 0 only) dump the rows to out_json.

With a `tpch_sf` argument the battery is the FULL 22-query TPC-H suite over a
deterministic generated dataset; without it, a small star-schema smoke set.

This is the reference's "N full Executor stacks" distributed test pattern
(query_optimizer/tests/DistributedExecutionGeneratorTestRunner.cpp:72,
kNumInstances = 3) realized as real separate processes + Gloo collectives.
"""

import json
import os
import sys


def main():
    proc_id, n_procs, port, out_json = (int(sys.argv[1]), int(sys.argv[2]),
                                        sys.argv[3], sys.argv[4])
    tpch_sf = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from quickstep_tpu.parallel import multihost
    multihost.bootstrap(coordinator_address=f"127.0.0.1:{port}",
                        num_processes=n_procs, process_id=proc_id)
    assert jax.process_count() == n_procs

    from quickstep_tpu.config import Config

    if tpch_sf > 0:
        from quickstep_tpu.bench.tpch import TPCH_QUERIES
        db = build_tpch_db(
            Config(distributed=True, replicate_threshold_rows=1000,
                   display_timing=False), tpch_sf)
        queries = {str(q): TPCH_QUERIES[q] for q in sorted(TPCH_QUERIES)}
    else:
        db = build_db(Config(distributed=True, replicate_threshold_rows=64,
                             display_timing=False))
        queries = QUERIES

    results = {}
    for name, sql in queries.items():
        res = db.execute(sql)
        results[name] = [list(r) for r in res.rows]

    multihost.barrier("done")
    if multihost.is_conductor():
        with open(out_json, "w") as f:
            json.dump(results, f)


QUERIES = {
    "filter_agg": "SELECT COUNT(*), SUM(v), MIN(v), MAX(v) FROM fact "
                  "WHERE v > 100",
    "groupby": "SELECT g, COUNT(*) AS c, SUM(v) AS s FROM fact "
               "GROUP BY g ORDER BY g",
    "join_agg": "SELECT d.name, SUM(f.v) AS s FROM fact f, dim d "
                "WHERE f.k = d.k GROUP BY d.name ORDER BY s DESC",
    "semi": "SELECT COUNT(*) FROM fact WHERE k IN "
            "(SELECT k FROM dim WHERE name <> 'd3')",
    "topn": "SELECT g, v FROM fact ORDER BY v DESC, g LIMIT 5",
}


def build_db(config):
    """Deterministic two-table star: fact(k, g, v) x dim(k, name)."""
    from quickstep_tpu import Database
    db = Database(config=config)
    db.execute("CREATE TABLE dim (k INT NOT NULL, name VARCHAR(10) NOT NULL)")
    db.execute("INSERT INTO dim VALUES " + ", ".join(
        f"({k}, 'd{k % 7}')" for k in range(1, 33)))
    db.execute("CREATE TABLE fact (k INT NOT NULL, g INT NOT NULL, "
               "v BIGINT NOT NULL)")
    rows = []
    x = 1
    for i in range(600):
        x = (x * 1103515245 + 12345) % (1 << 31)
        rows.append(f"({1 + x % 32}, {x % 5}, {x % 1000})")
    db.execute("INSERT INTO fact VALUES " + ", ".join(rows))
    db.execute("\\analyze")
    return db


def build_tpch_db(config, sf):
    """Deterministic TPC-H at scale `sf` (every process generates the same
    data: load_tpch is seeded)."""
    from quickstep_tpu import Database
    from quickstep_tpu.bench.tpch import load_tpch
    db = Database(config=config)
    load_tpch(db, scale=sf, seed=0)
    return db


if __name__ == "__main__":
    main()
