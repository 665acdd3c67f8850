"""Benchmark entry point (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol mirrors the reference harness (benchmarks/tpch/run-benchmark.sh: warm-up
run discarded, report middle of repeated trials): per query, 1 compile/warm run +
N timed runs, median taken. Metric = aggregate lineitem-rows/s across the query set
(scan-dominated TPC-H queries), the per-chip throughput north star from
BASELINE.json. vs_baseline is 1.0: the reference publishes no numbers and cannot be
built offline (BASELINE.md), so the recorded value is its own cross-round baseline.
"""

import json
import os
import statistics
import sys
import time


def main():
    sf = float(os.environ.get("BENCH_SF", "0.1"))
    qspec = os.environ.get("BENCH_QUERIES", "1,6,3,12")
    qlist = list(range(1, 23)) if qspec == "all" else [int(q) for q in qspec.split(",")]
    trials = int(os.environ.get("BENCH_TRIALS", "3"))

    from quickstep_tpu import Database
    from quickstep_tpu.bench.tpch import TPCH_QUERIES, load_tpch

    t0 = time.perf_counter()
    cache_dir = os.environ.get("BENCH_CACHE", f"data/tpch_sf{sf}")
    if os.path.exists(os.path.join(cache_dir, "catalog.json")):
        db = Database(storage_path=cache_dir)
    else:
        db = Database()
        load_tpch(db, scale=sf, seed=0)
        db.config.storage_path = cache_dir
        db.save()
    load_s = time.perf_counter() - t0
    lrows = db.catalog.default_database.get_relation("lineitem").num_tuples

    total_time = 0.0
    per_query = {}
    for q in qlist:
        sql = TPCH_QUERIES[q]
        db.execute(sql)  # compile + warm (reference skips run 1: QuickstepCli.cpp:143)
        times = []
        for _ in range(trials):
            t0 = time.perf_counter()
            db.execute(sql)
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        per_query[q] = med
        total_time += med

    rows_per_s = (lrows * len(qlist)) / total_time if total_time > 0 else 0.0
    result = {
        "metric": f"TPC-H SF{sf} Q{{{','.join(map(str, qlist))}}} lineitem-rows/s/chip",
        "value": round(rows_per_s, 1),
        "unit": "rows/s",
        "vs_baseline": 1.0,
    }
    print(json.dumps(result))
    print(f"# load={load_s:.1f}s lineitem={lrows} " +
          " ".join(f"Q{q}={t*1000:.1f}ms" for q, t in per_query.items()),
          file=sys.stderr)


if __name__ == "__main__":
    main()
