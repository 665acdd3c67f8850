"""Roofline calibration microbench (VERDICT r5 #3).

Establishes the ACHIEVABLE device memory bandwidth ceiling in this
environment with synthetic, device-resident arrays at SF10 lineitem width
(~60M rows), so Q6's roofline claim can be evaluated against a measured
ceiling rather than the 819 GB/s paper number.

Measured ladders (all f32/i32, device-resident, jit-compiled, median of
timed reps after a warm run):

  sum1        — jnp.sum over 1 column            (pure reduce read)
  q6_xla      — the Q6 shape: 4 columns read, 3-predicate mask,
                sum(price*disc*mask) + count     (XLA lowering)
  copy        — x + 1.0 materialized             (read+write streaming bound)

Measured on 2026-08-21 (TPU v5 lite over the axon tunnel, 60M rows):
sum1 161.5 GB/s, q6_xla 155.8 GB/s, i.e. XLA's fused masked multi-column
aggregate runs within 4%% of the machine's own pure-reduce bandwidth — there
is no headroom for a hand kernel on this path. The former ops/pallas_scan.py
kernel was evaluated against this ladder and removed: its scratch-carry
formulation crashes the environment's remote AOT TPU compiler
(tpu_compile_helper exit 1), and a scratchless partial-output reformulation
compiled but reached only 76.5 GB/s (2x slower than the XLA lowering).
SURVEY §7's "Pallas where XLA falls short" test therefore resolves to: XLA
does not fall short on the scan-aggregate path.

Reference bar: the reference promises "data at bare-metal speed"
(/root/reference/README.md:24-36); its scan unit is a block-local loop
(relational_operators/SelectOperator.hpp). Here the unit is one fused XLA
reduce or one Pallas pipeline over the resident column.

    python tools/calibrate.py [rows_millions]   # default 60 (SF10)

Prints one JSON line: {"ceiling_gbps": ..., per-test: {gbps, ms}}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=20):
    """Device time per execution under the axon tunnel: pipelined re-issues
    amortize the dispatch RTT, and a device_get of the (tiny) result forces
    actual completion (block_until_ready returns at enqueue over the tunnel —
    same protocol as exec/executor.py profile_device_reps)."""
    jax.device_get(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / reps


def main():
    mrows = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    n = int(mrows * 1e6)
    n = (n // 2048) * 2048  # pallas tile multiple
    dev = jax.devices()[0]
    print(f"device={dev.device_kind} rows={n}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    qty = jnp.asarray(rng.uniform(1, 50, n).astype(np.float32))
    price = jnp.asarray(rng.uniform(900, 105000, n).astype(np.float32))
    disc = jnp.asarray(rng.uniform(0, 0.1, n).astype(np.float32))
    sdate = jnp.asarray(rng.integers(8000, 11000, n).astype(np.int32))

    res = {"rows": n, "device": dev.device_kind}

    # 1. pure single-column reduce
    f_sum = jax.jit(lambda x: jnp.sum(x, dtype=jnp.float32))
    t = timed(f_sum, price)
    res["sum1"] = {"ms": round(t * 1e3, 3), "gbps": round(4 * n / t / 1e9, 1)}

    # 2. Q6 shape: 4 cols read, 3 predicates, masked product-sum + count
    def q6(q, p, d, s):
        m = (s >= 8766) & (s < 9131) & (d >= 0.05) & (d <= 0.07) & (q < 24)
        mf = m.astype(jnp.float32)
        return jnp.sum(p * d * mf), jnp.sum(mf)

    f_q6 = jax.jit(q6)
    t = timed(f_q6, qty, price, disc, sdate)
    res["q6_xla"] = {"ms": round(t * 1e3, 3),
                     "gbps": round(16 * n / t / 1e9, 1)}

    # 3. streaming copy (read+write). device_get of ONE element of the
    # committed output forces completion without pulling 240MB over the
    # tunnel (slicing outside jit cannot be DCE'd into the program).
    f_copy = jax.jit(lambda x: x + 1.0)
    y = f_copy(price)
    jax.device_get(y[0])
    t0 = time.perf_counter()
    for _ in range(10):
        y = f_copy(price)
    jax.device_get(y[0])
    t = (time.perf_counter() - t0) / 10
    res["copy"] = {"ms": round(t * 1e3, 3), "gbps": round(8 * n / t / 1e9, 1)}

    ceiling = max(v.get("gbps", 0) for v in res.values()
                  if isinstance(v, dict))
    res["ceiling_gbps"] = ceiling
    print(json.dumps(res))


if __name__ == "__main__":
    main()
