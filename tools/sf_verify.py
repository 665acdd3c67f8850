"""Phase B of large-scale TPC-H verification: run the engine's 22 queries
against a saved store and compare row-exact (float tolerance) with the
sqlite oracle results produced by tools/sf_oracle.py.

    python tools/sf_verify.py <sf> [oracle.json] [out.json]

Runs on whatever backend jax selects (the real chip under axon). The
comparison rules mirror tests/test_tpch.py.
"""

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from quickstep_tpu import Database  # noqa: E402
from quickstep_tpu.bench.tpch import TPCH_QUERIES, with_tiebreak  # noqa: E402


def _row_eq(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-8, abs_tol=1e-6):
                return False
        elif isinstance(x, float) or isinstance(y, float):
            if x is None or y is None:
                return False
            if not math.isclose(float(x), float(y), rel_tol=1e-9,
                                abs_tol=1e-6):
                return False
        elif x != y:
            return False
    return True


def _norm_key(r):
    """Canonical sort key for multiset matching: floats participate rounded
    to 4dp (bucketing only — equality is decided by _row_eq's isclose, so a
    .xxx5 representation boundary can no longer produce a false MISMATCH the
    way the old round-to-2dp-and-repr comparison did)."""
    return tuple(("f", round(v, 4)) if isinstance(v, float)
                 else ("v", repr(v)) for v in r)


def _multiset_eq(a, b):
    sa = sorted(a, key=_norm_key)
    sb = sorted(b, key=_norm_key)
    return all(_row_eq(x, y) for x, y in zip(sa, sb))


def compare(qnum, ours, oracle, ordered):
    if len(ours) != len(oracle):
        return f"row count {len(ours)} vs {len(oracle)}"
    if ordered:
        for i, (a, b) in enumerate(zip(ours, oracle)):
            if not _row_eq(a, b):
                return f"row {i}: {a!r} != {b!r}"
        return None
    return None if _multiset_eq(ours, oracle) else "multiset mismatch"


def main():
    if "--cpu" in sys.argv:   # validation runs off-chip
        sys.argv.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    oracle_path = sys.argv[2] if len(sys.argv) > 2 \
        else f"/tmp/sf{sf}_oracle.json"
    out_path = sys.argv[3] if len(sys.argv) > 3 \
        else os.path.join(REPO, f"SF{sf:g}_VERIFY.json")
    with open(oracle_path) as f:
        oracle = json.load(f)["results"]
    qlist = sorted(TPCH_QUERIES)
    if len(sys.argv) > 4:   # explicit order, e.g. run fault-prone queries last
        qlist = [int(x) for x in sys.argv[4].split(",")]
    if os.path.exists(out_path):   # resume: keep prior per-query results
        try:
            with open(out_path) as f:
                prior = json.load(f)["queries"]
        except Exception:
            prior = {}
    else:
        prior = {}

    t0 = time.time()
    db = Database(storage_path=os.path.join(REPO, f"data/tpch_sf{sf}"))
    report = {int(k): v for k, v in prior.items()
              if v.get("status") == "ok"}
    n_ok = len(report)
    for q in qlist:
        if q in report and report[q].get("status") == "ok":
            continue
        if str(q) not in oracle or "error" in oracle[str(q)]:
            report[q] = {"status": "no-oracle"}
            continue
        sql = with_tiebreak(q, TPCH_QUERIES[q])
        qs = time.time()
        try:
            ours = db.execute(sql).rows
        except Exception as e:
            report[q] = {"status": "engine-error",
                         "error": f"{type(e).__name__}: {e}"[:300]}
            print(f"# Q{q} ENGINE ERROR: {e}", flush=True)
            _dump(out_path, sf, report, n_ok, t0)
            continue
        wall = time.time() - qs
        orows = [tuple(r) for r in oracle[str(q)]["rows"]]
        ordered = "order by" in sql.lower()
        diff = compare(q, [tuple(r) for r in ours], orows, ordered)
        status = "ok" if diff is None else f"MISMATCH: {diff}"
        n_ok += diff is None
        report[q] = {"status": status, "rows": len(ours),
                     "wall_s": round(wall, 1)}
        print(f"# Q{q}: {status} ({len(ours)} rows, {wall:.1f}s)", flush=True)
        _dump(out_path, sf, report, n_ok, t0)
    print(f"# {n_ok}/22 row-exact at SF{sf:g} in {time.time()-t0:.0f}s",
          flush=True)


def _dump(out_path, sf, report, n_ok, t0):
    with open(out_path, "w") as f:
        json.dump({"sf": sf, "queries": report, "ok": n_ok,
                   "total_s": round(time.time() - t0, 1)}, f, indent=1)


if __name__ == "__main__":
    main()
