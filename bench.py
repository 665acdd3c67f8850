"""Benchmark entry point (driver-run on real TPU hardware).

Prints a JSON summary line after EVERY measured query (the last line printed is
always the most complete): {"metric", "value", "unit", "vs_baseline"}. A run
killed at any point — driver timeout, SIGTERM, anything after the first query —
still leaves a valid summary line on stdout and a populated BENCH_DETAIL.json.

Protocol mirrors the reference harness (benchmarks/tpch/run-benchmark.sh:79,91:
warm-up run discarded, report middle of repeated trials): per query, 1
compile/warm run + N timed runs, median taken. Queries run cheapest-compile
first so a cold environment produces numbers within minutes; the heavy plan
shapes (Q3/Q18/Q20/Q21 in this engine) come last. While the main process times
queries in order, background warm processes (one per query, the parallel
compile pattern of tools/warm_cache.py) push the remaining plan shapes through
the concurrent remote XLA compile service into the shared persistent cache.

Roofline accounting (BASELINE.json north star: >=70% of per-chip roofline on
bandwidth-bound operators): per query we record the unpadded bytes of every base
column the plan reads (executor.last_scan_bytes); achieved scan bandwidth =
bytes/time, and vs_baseline = aggregate achieved bandwidth / HBM peak (v5e ~819
GB/s, override with BENCH_HBM_GBPS). This is conservative: intermediate
materializations also move HBM bytes but are not credited.

Per-query details go to stderr (flushed per query) and BENCH_DETAIL.json.
"""

import json
import os
import signal
import statistics
import subprocess
import sys
import tempfile
import time


HBM_PEAK_GBPS = float(os.environ.get("BENCH_HBM_GBPS", "819"))
# Measured achievable ceiling in THIS environment (tools/calibrate.py,
# 2026-08-21: pure resident jnp.sum = 161.5 GB/s on the tunneled v5e chip —
# the paper 819 number is not reachable even by a bare reduce here). Roofline
# fractions are reported against BOTH.
MEASURED_CEILING_GBPS = float(os.environ.get("BENCH_CEILING_GBPS", "161.5"))

# Cheapest-compile-first measurement order (round-2 compile-time observations:
# Q3/Q18/Q20/Q21 take 10-20+ min cold on the remote compile service).
QUERY_ORDER = [6, 14, 19, 1, 12, 4, 15, 22, 11, 16, 10, 5, 17, 2, 7, 8, 9, 13,
               18, 3, 20, 21]

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))

_WARM_CHILD = """
import sys, time
sys.path.insert(0, sys.argv[3])
t0 = time.time()
from quickstep_tpu import Database
from quickstep_tpu.bench.tpch import TPCH_QUERIES
q = int(sys.argv[1])
db = Database(storage_path=sys.argv[2])
r = db.execute(TPCH_QUERIES[q])
print(f"warm Q{q}: {time.time()-t0:.1f}s rows={len(r.rows)}", flush=True)
"""


class Reporter:
    """Accumulates per-query results; emits the summary + detail file after
    every query and on SIGTERM/SIGINT/SIGALRM, so no result is ever lost."""

    def __init__(self, sf, lrows, load_s):
        self.sf = sf
        self.lrows = lrows
        self.load_s = load_s
        self.detail = {}
        self.skipped = []
        self.total_dev = 0.0
        self.total_wall = 0.0
        self.total_bytes = 0

    def record(self, q, entry, dev=0.0, wall=0.0, qbytes=0):
        self.detail[q] = entry
        self.total_dev += dev
        self.total_wall += wall
        self.total_bytes += qbytes
        self.emit()

    def summary(self):
        agg = self.total_bytes / self.total_dev / 1e9 if self.total_dev > 0 \
            else 0.0
        n_ok = sum(1 for d in self.detail.values() if "ms" in d)
        return agg, n_ok, {
            "metric": f"TPC-H SF{self.sf} {n_ok}-query achieved scan "
                      f"bandwidth/chip",
            "value": round(agg, 3),
            "unit": "GB/s",
            "vs_baseline": round(agg / HBM_PEAK_GBPS, 4),
        }

    def emit(self, final=False):
        agg, n_ok, result = self.summary()
        print(json.dumps(result), flush=True)
        rows_per_s = (self.lrows * n_ok) / self.total_wall \
            if self.total_wall > 0 else 0.0
        try:
            with open(os.path.join(REPO_ROOT, "BENCH_DETAIL.json"), "w") as f:
                json.dump({"sf": self.sf, "queries": self.detail,
                           "skipped": self.skipped,
                           "load_s": round(self.load_s, 1),
                           "lineitem_rows": self.lrows,
                           "rows_per_s": round(rows_per_s, 1),
                           "agg_gbps": round(agg, 3),
                           "hbm_peak_gbps": HBM_PEAK_GBPS,
                           "measured_ceiling_gbps": MEASURED_CEILING_GBPS,
                           "final": final}, f, indent=1)
        except OSError:
            pass
        if final:
            print(f"# load={self.load_s:.1f}s lineitem={self.lrows} "
                  f"wall={self.total_wall*1000:.0f}ms "
                  f"dev={self.total_dev*1000:.0f}ms agg={agg:.2f}GB/s "
                  f"({100*agg/HBM_PEAK_GBPS:.1f}% of {HBM_PEAK_GBPS:.0f}GB/s "
                  f"roofline) rows/s={rows_per_s:.3g}", file=sys.stderr)
            if self.skipped:
                print(f"# SKIPPED (budget): {self.skipped}", file=sys.stderr)
            sys.stderr.flush()


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
    if qspec == "all":
        qlist = list(QUERY_ORDER)
    else:
        wanted = {int(q) for q in qspec.split(",")}
        qlist = [q for q in QUERY_ORDER if q in wanted]
    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    # Soft wall-clock budget for the measurement phase (excludes data
    # generation/load): stop starting new queries once spent; everything
    # measured so far has already been emitted.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2400"))
    warm_par = int(os.environ.get("BENCH_WARM_PAR", "4"))

    from quickstep_tpu import Database
    from quickstep_tpu.bench.tpch import TPCH_QUERIES, load_tpch

    t0 = time.perf_counter()
    cache_dir = os.environ.get("BENCH_CACHE",
                               os.path.join(REPO_ROOT, f"data/tpch_sf{sf}"))
    if os.path.exists(os.path.join(cache_dir, "catalog.json")):
        db = Database(storage_path=cache_dir)
    else:
        db = Database()
        load_tpch(db, scale=sf, seed=0)
        db.config.storage_path = cache_dir
        db.save()
    dev_reps = int(os.environ.get("BENCH_DEV_REPS", "4"))
    db.config.profile_device_reps = 0
    load_s = time.perf_counter() - t0
    lrows = db.catalog.default_database.get_relation("lineitem").num_tuples

    rep = Reporter(sf, lrows, load_s)

    def on_signal(signum, frame):
        rep.emit(final=True)
        os._exit(0)

    for s in (signal.SIGTERM, signal.SIGINT):
        signal.signal(s, on_signal)

    # Background compile warmers for everything after the first query: the
    # remote XLA compile service takes concurrent requests, so later plan
    # shapes compile while earlier queries are being measured.
    warm_procs = {}
    warm_pending = [q for q in qlist[1:]]
    warm_logs = {}

    def pump_warmers():
        for q, p in list(warm_procs.items()):
            if p.poll() is not None:
                del warm_procs[q]
        while warm_pending and len(warm_procs) < warm_par:
            q = warm_pending.pop(0)
            logf = tempfile.NamedTemporaryFile(
                mode="w+", delete=False, prefix=f"bench_warm_q{q}_",
                suffix=".log")
            warm_logs[q] = logf.name
            warm_procs[q] = subprocess.Popen(
                [sys.executable, "-c", _WARM_CHILD, str(q), cache_dir,
                 REPO_ROOT], stdout=logf, stderr=subprocess.STDOUT)
            logf.close()

    if warm_par > 0 and os.path.exists(os.path.join(cache_dir,
                                                    "catalog.json")):
        pump_warmers()

    t_meas = time.perf_counter()
    for q in qlist:
        pump_warmers()
        if time.perf_counter() - t_meas > budget_s:
            rep.skipped.append(q)
            continue
        sql = TPCH_QUERIES[q]
        try:
            # compile + warm (reference skips run 1: QuickstepCli.cpp:143)
            db.execute(sql)
            # ONE device-time measurement run (pipelined re-issues amortize
            # the tunnel RTT), then wall trials WITHOUT the profiling
            # re-issues — the committed wall must reflect a single execution,
            # not 1 + reps of them.
            db.config.profile_device_reps = dev_reps
            db.execute(sql)
            prof = db.executor.last_profile or {}
            dev = prof.get("device_ms", prof.get("exec_ms", 0.0)) / 1000
            db.config.profile_device_reps = 0
            times = []
            for _ in range(trials):
                t1 = time.perf_counter()
                db.execute(sql)
                times.append(time.perf_counter() - t1)
        except Exception as e:  # never lose the whole bench to one query
            rep.record(q, {"error": f"{type(e).__name__}: {e}"[:300]})
            print(f"# Q{q} FAILED: {type(e).__name__}: {e}"[:300],
                  file=sys.stderr)
            sys.stderr.flush()
            continue
        med = statistics.median(times)
        qbytes = getattr(db.executor, "last_scan_bytes", 0)
        # roofline fraction from the on-device program time (the tunnel RTT of
        # this dev environment is not chip bandwidth); wall ms stays visible
        gbps = qbytes / dev / 1e9 if dev > 0 else 0.0
        entry = {"ms": round(med * 1000, 1),
                 "dev_ms": round(dev * 1000, 1),
                 "scan_mb": round(qbytes / 1e6, 1),
                 "gbps": round(gbps, 2),
                 "roofline_pct": round(100.0 * gbps / HBM_PEAK_GBPS, 2),
                 "ceiling_pct": round(100.0 * gbps / MEASURED_CEILING_GBPS, 2),
                 "dispatches": getattr(db.executor, "dispatches", None)}
        ops = (db.executor.last_profile or {}).get("op_stats")
        if ops:
            entry["gathers"] = ops["gathers"]
        if getattr(db.executor, "last_sort_path", None):
            entry["sort"] = db.executor.last_sort_path
        if os.environ.get("BENCH_PROFILE"):
            # per-operator-class attribution (eager node-by-node stepping,
            # the WorkOrder-timing analog): scan / join / agg / sort ms
            try:
                entry["ops"] = _profile_op_classes(db, sql)
            except Exception as e:
                entry["ops_error"] = str(e)[:120]
        rep.record(q, entry, dev=dev, wall=med, qbytes=qbytes)
        print(f"# Q{q}: {entry['ms']}ms (dev {entry['dev_ms']}ms) "
              f"scan={entry['scan_mb']}MB {entry['gbps']}GB/s "
              f"({entry['roofline_pct']}%)", file=sys.stderr)
        sys.stderr.flush()

    for q, p in warm_procs.items():
        p.terminate()
    for path in warm_logs.values():
        try:
            os.unlink(path)
        except OSError:
            pass
    rep.emit(final=True)


if __name__ == "__main__":
    main()
