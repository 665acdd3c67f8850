"""Multi-host distributed execution test: N separate processes, each with its
own CPU devices, coordinated by jax.distributed — results must match a
single-process run row-for-row (reference pattern:
DistributedExecutionGeneratorTestRunner with kNumInstances=3, here with real
process boundaries and Gloo collectives standing in for ICI/DCN)."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("n_procs", [2])
def test_multihost_matches_single_process(tmp_path, n_procs):
    out_json = str(tmp_path / "mh_results.json")
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)   # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(n_procs), str(port), out_json],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(n_procs)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    with open(out_json) as f:
        mh = json.load(f)

    # single-process expected results (same deterministic data)
    from multihost_worker import QUERIES, build_db
    from quickstep_tpu.config import Config
    db = build_db(Config(display_timing=False))
    for name, sql in QUERIES.items():
        expected = [list(r) for r in db.execute(sql).rows]
        assert mh[name] == expected, (
            f"{name}: multihost {mh[name]} != single {expected}")
