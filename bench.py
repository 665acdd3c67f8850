"""Benchmark entry point (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol mirrors the reference harness (benchmarks/tpch/run-benchmark.sh:79,91:
warm-up run discarded, report middle of repeated trials): per query, 1 compile/warm
run + N timed runs, median taken.

Roofline accounting (BASELINE.json north star: >=70% of per-chip roofline on
bandwidth-bound operators): per query we record the unpadded bytes of every base
column the plan reads (executor.last_scan_bytes); achieved scan bandwidth =
bytes/time, and vs_baseline = aggregate achieved bandwidth / HBM peak (v5e ~819
GB/s, override with BENCH_HBM_GBPS). This is conservative: intermediate
materializations also move HBM bytes but are not credited.

Per-query details go to stderr and BENCH_DETAIL.json.
"""

import json
import os
import statistics
import sys
import time


HBM_PEAK_GBPS = float(os.environ.get("BENCH_HBM_GBPS", "819"))


def _profile_op_classes(db, sql):
    """Warm per-operator-class ms for one query: {scan|join|agg|sort|other}.
    Eager stepping attributes wall-clock to each plan node
    (utils/visualize.profile_plan — the per-WorkOrder timing analog)."""
    from quickstep_tpu.parser import parse_one
    from quickstep_tpu.optimizer.resolver import Resolver
    from quickstep_tpu.optimizer.rules import optimize_plan
    from quickstep_tpu.optimizer import logical as L
    from quickstep_tpu.utils.visualize import profile_plan
    dbase = db.catalog.default_database
    plan = optimize_plan(Resolver(dbase).resolve_select(parse_one(sql)),
                         db.config, dbase)
    times = profile_plan(db.executor, plan)
    classes = {}

    def cls(n):
        if isinstance(n, (L.TableScan, L.Filter)):
            return "scan"
        if isinstance(n, L.Join):
            return "join"
        if isinstance(n, (L.Aggregate, L.Distinct)):
            return "agg"
        if isinstance(n, L.Sort):
            return "sort"
        return "other"

    def walk(n):
        classes[cls(n)] = classes.get(cls(n), 0.0) + times.get(id(n), 0.0)
        for c in n.children():
            walk(c)
    walk(plan)
    return {k: round(v * 1000, 1) for k, v in sorted(classes.items())}


def main():
    sf = float(os.environ.get("BENCH_SF", "1.0"))
    qspec = os.environ.get("BENCH_QUERIES", "all")
    qlist = list(range(1, 23)) if qspec == "all" else [int(q) for q in qspec.split(",")]
    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    # Soft wall-clock budget: cold remote XLA compiles in this environment run
    # minutes per plan shape; rather than let the whole bench run time out with
    # no output, stop starting new queries once the budget is spent and report
    # the queries measured so far (skipped ones are listed in the detail file).
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2400"))

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
    db.config.profile_device_reps = int(os.environ.get("BENCH_DEV_REPS", "4"))
    load_s = time.perf_counter() - t0
    lrows = db.catalog.default_database.get_relation("lineitem").num_tuples

    total_time = 0.0
    total_wall = 0.0
    total_bytes = 0
    detail = {}
    skipped = []
    for q in qlist:
        if time.perf_counter() - t0 > budget_s:
            skipped.append(q)
            continue
        sql = TPCH_QUERIES[q]
        try:
            db.execute(sql)  # compile + warm (reference skips run 1: QuickstepCli.cpp:143)
        except Exception as e:  # never lose the whole bench to one query
            detail[q] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"# Q{q} FAILED: {type(e).__name__}: {e}"[:300],
                  file=sys.stderr)
            continue
        times = []
        dev_times = []
        for _ in range(trials):
            t1 = time.perf_counter()
            db.execute(sql)
            times.append(time.perf_counter() - t1)
            prof = db.executor.last_profile or {}
            # device_ms (pipelined, RTT-amortized) when available, else the
            # dispatch+block time
            dev_times.append(prof.get("device_ms",
                                      prof.get("exec_ms", 0.0)) / 1000)
        med = statistics.median(times)
        dev = statistics.median(dev_times)
        qbytes = getattr(db.executor, "last_scan_bytes", 0)
        # roofline fraction from the on-device program time (the tunnel RTT of
        # this dev environment is not chip bandwidth); wall ms stays visible
        gbps = qbytes / dev / 1e9 if dev > 0 else 0.0
        detail[q] = {"ms": round(med * 1000, 1),
                     "dev_ms": round(dev * 1000, 1),
                     "scan_mb": round(qbytes / 1e6, 1),
                     "gbps": round(gbps, 2),
                     "roofline_pct": round(100.0 * gbps / HBM_PEAK_GBPS, 2)}
        if os.environ.get("BENCH_PROFILE"):
            # per-operator-class attribution (eager node-by-node stepping,
            # the WorkOrder-timing analog): scan / join / agg / sort ms
            detail[q]["ops"] = _profile_op_classes(db, sql)
        total_time += dev
        total_wall += med
        total_bytes += qbytes

    agg_gbps = total_bytes / total_time / 1e9 if total_time > 0 else 0.0
    n_ok = sum(1 for d in detail.values() if "ms" in d)
    result = {
        "metric": f"TPC-H SF{sf} {n_ok}-query achieved scan bandwidth/chip",
        "value": round(agg_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(agg_gbps / HBM_PEAK_GBPS, 4),
    }
    print(json.dumps(result))
    rows_per_s = (lrows * n_ok) / total_wall if total_wall > 0 else 0.0
    if skipped:
        print(f"# SKIPPED (over BENCH_BUDGET_S={budget_s:.0f}): {skipped}",
              file=sys.stderr)
    print(f"# load={load_s:.1f}s lineitem={lrows} wall={total_wall*1000:.0f}ms "
          f"dev={total_time*1000:.0f}ms agg={agg_gbps:.2f}GB/s "
          f"({100*agg_gbps/HBM_PEAK_GBPS:.1f}% of {HBM_PEAK_GBPS:.0f}GB/s "
          f"roofline) rows/s={rows_per_s:.3g}", file=sys.stderr)
    for q, d in detail.items():
        if "ms" not in d:
            continue
        print(f"# Q{q}: {d['ms']}ms (dev {d['dev_ms']}ms) scan={d['scan_mb']}MB "
              f"{d['gbps']}GB/s ({d['roofline_pct']}%)", file=sys.stderr)
    with open("BENCH_DETAIL.json", "w") as f:
        json.dump({"sf": sf, "queries": detail, "skipped": skipped,
                   "load_s": round(load_s, 1),
                   "lineitem_rows": lrows, "rows_per_s": round(rows_per_s, 1),
                   "agg_gbps": round(agg_gbps, 3),
                   "hbm_peak_gbps": HBM_PEAK_GBPS}, f, indent=1)


if __name__ == "__main__":
    main()
