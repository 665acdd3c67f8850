"""On-chip A/B: TPC-H Q1 via the XLA dense-groupby lowering vs the Pallas
single-pass two-float kernel (config.use_pallas_groupby). Run on the real TPU:

    python tools/pallas_bench.py [sf]

Prints device-time medians (pipelined reps amortize the tunnel RTT) and the
max relative row diff between the two paths."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from quickstep_tpu import Database
from quickstep_tpu.bench.tpch import TPCH_QUERIES, load_tpch


def run(flag, store, reps=6):
    db = Database(storage_path=store)
    db.config.use_pallas_groupby = flag
    db.config.profile_device_reps = reps
    t0 = time.time()
    db.execute(TPCH_QUERIES[1])              # compile + warm
    compile_s = time.time() - t0
    db.execute(TPCH_QUERIES[1])
    prof = dict(db.executor.last_profile or {})
    prof["compile_s"] = round(compile_s, 1)
    rows = db.execute(TPCH_QUERIES[1]).rows
    return prof, rows


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    store = f"data/tpch_sf{sf}"
    if not os.path.exists(os.path.join(store, "catalog.json")):
        db = Database()
        load_tpch(db, scale=sf, seed=0)
        db.config.storage_path = store
        db.save()
    xla_prof, xla_rows = run(False, store)
    pal_prof, pal_rows = run(True, store)
    print("XLA   :", xla_prof)
    print("Pallas:", pal_prof)
    assert len(xla_rows) == len(pal_rows)
    worst = 0.0
    for ra, rb in zip(xla_rows, pal_rows):
        for x, y in zip(ra, rb):
            if isinstance(x, float) and x:
                worst = max(worst, abs(x - y) / max(1.0, abs(x)))
            else:
                assert x == y, (x, y)
    print(f"rows={len(xla_rows)} max_rel_diff={worst:.3e}")
    dx = xla_prof.get("device_ms")
    dp = pal_prof.get("device_ms")
    if dx and dp:
        print(f"device speedup: {dx / dp:.2f}x  ({dx:.2f} ms -> {dp:.2f} ms)")


if __name__ == "__main__":
    main()
