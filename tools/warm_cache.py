"""Warm the persistent XLA compile cache for the TPC-H bench, in parallel.

The remote XLA:TPU compile service used in this environment takes minutes per
plan shape but accepts CONCURRENT requests (ROUND2_NOTES #4). bench.py runs
queries sequentially and would spend hours cold; this tool runs one process per
query so many plan shapes compile per wall-minute, all landing in the shared
persistent cache (~/.cache/qstpu_xla) keyed by HLO.

    python tools/warm_cache.py [sf] [q1,q2,... | all] [max_parallel]

Each child opens the cached store read-only, executes its query once (compile +
run), prints timing, exits. Failures are reported but don't stop the others.
"""

import os
import subprocess
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import os, sys, time
sys.path.insert(0, sys.argv[3])  # repo root: run from anywhere
t0 = time.time()
from quickstep_tpu import Database
from quickstep_tpu.bench.tpch import TPCH_QUERIES
q = int(sys.argv[1])
db = Database(storage_path=sys.argv[2])
r = db.execute(TPCH_QUERIES[q])
print(f"Q{q}: {time.time()-t0:.1f}s rows={len(r.rows)}", flush=True)
"""


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    qspec = sys.argv[2] if len(sys.argv) > 2 else "all"
    qlist = list(range(1, 23)) if qspec == "all" else [int(x) for x in qspec.split(",")]
    maxpar = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    store = os.path.join(REPO_ROOT, f"data/tpch_sf{sf}")
    procs = {}
    pending = list(qlist)
    t0 = time.time()
    while pending or procs:
        while pending and len(procs) < maxpar:
            q = pending.pop(0)
            # children write to temp files, not pipes: a child dumping a huge
            # Mosaic/MLIR error would fill a 64KB pipe buffer and deadlock
            out = tempfile.NamedTemporaryFile(mode="w+", delete=False,
                                              prefix=f"warm_q{q}_",
                                              suffix=".log")
            p = subprocess.Popen(
                [sys.executable, "-c", CHILD, str(q), store, REPO_ROOT],
                stdout=out, stderr=subprocess.STDOUT)
            procs[q] = (p, out.name)
            out.close()
        time.sleep(2)
        for q, (p, path) in list(procs.items()):
            if p.poll() is not None:
                try:
                    with open(path, errors="replace") as f:
                        out_text = f.read()
                    os.unlink(path)
                except OSError:
                    out_text = ""
                lines = [l for l in out_text.strip().splitlines() if l]
                ok = p.returncode == 0
                tail = lines[-1:] if ok else lines[-25:]
                status = "ok" if ok else f"FAIL rc={p.returncode}"
                print(f"[{time.time()-t0:6.0f}s] Q{q} {status}  "
                      + "\n    ".join(l[:300] for l in tail), flush=True)
                del procs[q]
    print(f"done in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
