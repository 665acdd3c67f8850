"""Per-fusion device-time attribution for one TPC-H query on the chip.

Runs the query under jax.profiler and prints the top XLA ops/fusions by
self time, so plan-level work (gathers, sorts, scatter passes) can be
attributed to query operators. This is the round-4 profiling recipe from
ROUND4_NOTES.md: eager per-op stepping lies under the tunnel RTT; the
profiler's device trace does not.

    python tools/fusion_profile.py <q> [sf] [reps]
"""

import glob
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main():
    q = int(sys.argv[1])
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    import jax
    from quickstep_tpu import Database
    from quickstep_tpu.bench.tpch import TPCH_QUERIES

    store = os.path.join(REPO_ROOT, f"data/tpch_sf{sf}")
    db = Database(storage_path=store)
    sql = TPCH_QUERIES[q]
    db.execute(sql)  # compile + warm
    logdir = f"/tmp/fusion_prof_q{q}"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(reps):
            db.execute(sql)

    print_xplane(logdir, reps)


def print_xplane(logdir, reps):
    xs = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                   recursive=True)
    if not xs:
        print("no xplane found under", logdir)
        return
    from jax.profiler import ProfileData
    p = ProfileData.from_serialized_xspace(open(xs[0], "rb").read())
    agg = {}
    for plane in p.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns
                agg[name] = agg.get(name, 0) + dur
    total = sum(agg.values())
    print(f"total device ns: {total} ({total/1e6/reps:.1f} ms/exec over "
          f"{reps} reps)")
    for name, ns in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ns/1e6/reps:9.2f} ms  {100*ns/max(total,1):5.1f}%  {name[:120]}")


if __name__ == "__main__":
    main()
