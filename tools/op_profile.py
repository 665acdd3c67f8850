"""Per-OPERATOR device-time attribution for one TPC-H query on the chip.

fusion_profile.py gives per-fusion times but no mapping back to plan nodes.
This tool closes the loop: PlanRunner.exec wraps every node in
jax.named_scope("qop<idx>_<Type>"), XLA preserves those scopes in HLO
instruction metadata (op_name), and --xla_dump_to writes the optimized HLO.
We parse the dump to map each top-level instruction (fusion.N, sort.N, ...)
to its innermost qop scope, then aggregate the profiler's XLA-Ops-line
device durations by operator.

    python tools/op_profile.py <q> [sf] [reps]

Prints per-operator ms/exec plus the top instructions inside the heaviest
operators. Run in a FRESH process (XLA_FLAGS is read at backend init).
"""

import glob
import os
import re
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

DUMP = "/tmp/xla_opdump"


def main():
    q = int(sys.argv[1])
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    os.system(f"rm -rf {DUMP}")
    # compiled HLO is saved by the executor's AOT path (axon compiles
    # server-side, so --xla_dump_to can't reach it)
    os.environ["QSTPU_HLO_DUMP"] = DUMP
    os.environ["QSTPU_COMPILE_CACHE"] = "off"
    import jax
    from quickstep_tpu import Database
    from quickstep_tpu.bench.tpch import TPCH_QUERIES

    store = os.path.join(REPO_ROOT, f"data/tpch_sf{sf}")
    db = Database(storage_path=store)
    sql = TPCH_QUERIES[q]
    db.execute(sql)  # compile (dumps HLO) + warm
    logdir = f"/tmp/op_prof_q{q}"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(reps):
            db.execute(sql)

    op_of = parse_dumps(DUMP)
    report(logdir, reps, op_of)


_META = re.compile(r'%?([a-zA-Z0-9_.\-]+) = .*metadata=\{[^}]*'
                   r'op_name="([^"]*)"')
_DEF = re.compile(r'^  %?([a-zA-Z0-9_.\-]+) = ')


def parse_dumps(dump_dir):
    """instruction name -> innermost qop scope, from every dumped module."""
    op_of = {}
    for path in glob.glob(os.path.join(dump_dir, "plan_*.txt")):
        fused_scope = {}   # per fused computation: scope votes
        cur_comp = None
        text = open(path).read()
        # 1st pass: collect op_name metadata for every instruction
        for line in text.splitlines():
            m = _META.search(line)
            if not m:
                continue
            name, op_name = m.group(1), m.group(2)
            scopes = [s for s in op_name.split("/") if s.startswith("qop")]
            scope = scopes[-1] if scopes else "(top)"
            op_of.setdefault(name, scope)
        # 2nd pass: fusions whose own metadata lacks a qop scope inherit the
        # majority scope of their fused computation's instructions
        comp_votes = {}
        for line in text.splitlines():
            cm = re.match(r"%?(fused_computation[^ ]*|region[^ ]*) ", line)
            if line.startswith("%") or line.startswith("ENTRY"):
                cur_comp = line.split(" ", 1)[0].lstrip("%")
            m = _META.search(line)
            if m and cur_comp:
                scopes = [s for s in m.group(2).split("/")
                          if s.startswith("qop")]
                if scopes:
                    comp_votes.setdefault(cur_comp, {})
                    comp_votes[cur_comp][scopes[-1]] = \
                        comp_votes[cur_comp].get(scopes[-1], 0) + 1
        # map fusion instr -> its computation
        for line in text.splitlines():
            fm = re.search(r"%?([a-zA-Z0-9_.\-]+) = .* fusion\(.*calls=%?"
                           r"([a-zA-Z0-9_.\-]+)", line)
            if fm:
                name, comp = fm.group(1), fm.group(2)
                if op_of.get(name) in (None, "(top)") and comp in comp_votes:
                    best = max(comp_votes[comp].items(), key=lambda kv: kv[1])
                    op_of[name] = best[0]
    return op_of


def report(logdir, reps, op_of):
    xs = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not xs:
        print("no xplane under", logdir)
        return
    from jax.profiler import ProfileData
    p = ProfileData.from_serialized_xspace(open(xs[0], "rb").read())
    per_op = {}
    per_instr = {}
    total = 0
    for plane in p.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = None
                for k, v in ev.stats:
                    if k == "device_duration_ps":
                        dur = int(v)
                if dur is None:
                    dur = ev.duration_ns * 1000
                name = ev.name.split(" ")[0].lstrip("%")
                scope = op_of.get(name, "(unattributed)")
                per_op[scope] = per_op.get(scope, 0) + dur
                key = (scope, name)
                per_instr[key] = per_instr.get(key, 0) + dur
                total += dur
    print(f"total XLA-Ops device: {total/1e9/reps:.1f} ms/exec "
          f"({reps} reps)")
    for scope, ps in sorted(per_op.items(), key=lambda kv: -kv[1]):
        print(f"{ps/1e9/reps:9.2f} ms  {100*ps/max(total,1):5.1f}%  {scope}")
    print("---- heaviest instructions ----")
    for (scope, name), ps in sorted(per_instr.items(),
                                    key=lambda kv: -kv[1])[:25]:
        print(f"{ps/1e9/reps:9.2f} ms  {scope:28s} {name}")


if __name__ == "__main__":
    main()
