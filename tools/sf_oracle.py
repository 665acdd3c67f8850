"""Large-scale TPC-H oracle: build a disk sqlite DB from a saved store and
run the 22 oracle queries, dumping results to JSON for offline comparison.

Phase A of the SFxx verification (tools/sf_verify.py is phase B): sqlite is
CPU-only, so this runs in the background while the chip does other work.

    python tools/sf_oracle.py <sf> [out.json] [db_path]

The reference's own correctness story is golden output comparison
(SURVEY.md §4.2); the reference engine can't be built offline, so sqlite over
identical data is the oracle, exactly as tests/test_tpch.py does at SF0.01.
"""

import json
import os
import sqlite3
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from quickstep_tpu import Database  # noqa: E402
from quickstep_tpu.bench.tpch import (  # noqa: E402
    TPCH_QUERIES, ORACLE_OVERRIDES, to_sqlite_sql, with_tiebreak,
)
from quickstep_tpu.types import TypeID  # noqa: E402

CHUNK = 500_000

INDEXES = [
    "CREATE INDEX il_ok ON lineitem(l_orderkey)",
    "CREATE INDEX il_pk ON lineitem(l_partkey)",
    "CREATE INDEX il_ps ON lineitem(l_partkey, l_suppkey)",
    "CREATE INDEX il_sk ON lineitem(l_suppkey)",
    "CREATE INDEX io_ok ON orders(o_orderkey)",
    "CREATE INDEX io_ck ON orders(o_custkey)",
    "CREATE INDEX ic_ck ON customer(c_custkey)",
    "CREATE INDEX ip_pk ON part(p_partkey)",
    "CREATE INDEX ips_pk ON partsupp(ps_partkey)",
    "CREATE INDEX ips_sk ON partsupp(ps_suppkey)",
    "CREATE INDEX is_sk ON supplier(s_suppkey)",
]


def decode_cols(rel):
    """Vectorized host decode of every column to python-compatible arrays."""
    from quickstep_tpu.types.datetime_util import date_to_str
    cols = []
    for a in rel.attributes:
        c = rel.data.columns[a.name]
        arr = np.asarray(c.data)
        tid = a.type.type_id
        if a.type.is_string:
            vals = np.asarray(c.dictionary.values, dtype=object)[arr]
        elif tid == TypeID.DECIMAL:
            vals = arr.astype(np.float64) / (10 ** a.type.scale)
        elif tid == TypeID.DATE:
            # decode distinct codes once, then map
            uniq, inv = np.unique(arr, return_inverse=True)
            strs = np.asarray([date_to_str(int(x)) for x in uniq],
                              dtype=object)
            vals = strs[inv]
        elif a.type.is_floating:
            vals = arr.astype(np.float64)
        else:
            vals = arr.astype(np.int64)
        cols.append(vals)
    return cols


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    out_path = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf{sf}_oracle.json"
    db_path = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/tpch_sf{sf}.db"
    store = os.path.join(REPO, f"data/tpch_sf{sf}")

    t0 = time.time()
    db = Database(storage_path=store)
    dbase = db.catalog.default_database

    fresh = not os.path.exists(db_path)
    conn = sqlite3.connect(db_path)
    conn.execute("PRAGMA journal_mode=OFF")
    conn.execute("PRAGMA synchronous=OFF")
    conn.execute("PRAGMA cache_size=-2000000")   # 2GB page cache
    conn.execute("PRAGMA temp_store=FILE")
    if fresh:
        for name in ("region", "nation", "supplier", "part", "partsupp",
                     "customer", "orders", "lineitem"):
            rel = dbase.get_relation(name)
            colnames = [a.name for a in rel.attributes]
            decls = []
            for a in rel.attributes:
                tid = a.type.type_id
                if tid == TypeID.INT or tid == TypeID.LONG:
                    decls.append(f"{a.name} INTEGER")
                elif tid in (TypeID.DOUBLE, TypeID.FLOAT, TypeID.DECIMAL):
                    decls.append(f"{a.name} REAL")
                else:
                    decls.append(f"{a.name} TEXT")
            conn.execute(f"CREATE TABLE {name} ({', '.join(decls)})")
            cols = decode_cols(rel)
            n = rel.data.num_rows
            ph = ", ".join("?" * len(colnames))
            for start in range(0, n, CHUNK):
                sl = slice(start, min(start + CHUNK, n))
                # .tolist() yields native python scalars — numpy scalars
                # would be stored as BLOBs by the sqlite3 adapter
                rows = list(zip(*[c[sl].tolist() for c in cols]))
                conn.executemany(f"INSERT INTO {name} VALUES ({ph})", rows)
                conn.commit()
            print(f"# loaded {name}: {n} rows @ {time.time()-t0:.0f}s",
                  flush=True)
            del cols
        for ix in INDEXES:
            conn.execute(ix)
            conn.commit()
        print(f"# indexes done @ {time.time()-t0:.0f}s", flush=True)

    results = {}
    for q in sorted(TPCH_QUERIES):
        qs = time.time()
        oracle_sql = with_tiebreak(q, ORACLE_OVERRIDES.get(q,
                                                           TPCH_QUERIES[q]))
        try:
            rows = conn.execute(to_sqlite_sql(oracle_sql)).fetchall()
            results[str(q)] = {"rows": rows,
                               "s": round(time.time() - qs, 1)}
            print(f"# Q{q}: {len(rows)} rows in {time.time()-qs:.0f}s",
                  flush=True)
        except Exception as e:
            results[str(q)] = {"error": str(e)[:200]}
            print(f"# Q{q} ERROR: {e}", flush=True)
        with open(out_path, "w") as f:
            json.dump({"sf": sf, "results": results,
                       "total_s": round(time.time() - t0, 1)}, f)
    print(f"# oracle done in {time.time()-t0:.0f}s -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
