"""Pallas single-pass dense group-by (interpret mode on CPU; the compiled
kernel is exercised on the real chip by tools/pallas_bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from quickstep_tpu.ops import groupby as G
from quickstep_tpu.ops.pallas_groupby import dense_groupby_sums


def _ref_sums(idx, alive, vals, domain):
    sums = [np.zeros(domain) for _ in vals]
    counts = np.zeros(domain, np.int64)
    for i in range(idx.shape[0]):
        g = idx[i]
        if alive[i] and 0 <= g < domain:
            counts[g] += 1
            for k, v in enumerate(vals):
                sums[k][g] += v[i]
    return sums, counts


def test_matches_reference_dense():
    rng = np.random.default_rng(0)
    n, domain = 5000, 6
    idx = rng.integers(0, domain, n)
    alive = rng.random(n) < 0.8
    vals = [rng.random(n) * 100, rng.normal(size=n)]
    sums, counts = dense_groupby_sums(
        jnp.asarray(idx), jnp.asarray(alive),
        [jnp.asarray(v) for v in vals], domain, interpret=True)
    rsums, rcounts = _ref_sums(idx, alive, vals, domain)
    assert np.array_equal(np.asarray(counts), rcounts)
    for s, r in zip(sums, rsums):
        np.testing.assert_allclose(np.asarray(s), r, rtol=1e-12)


def test_dead_lane_nan_does_not_poison():
    n, domain = 2048, 2
    idx = np.zeros(n, np.int64)
    alive = np.ones(n, bool)
    alive[100:] = False
    v = np.ones(n)
    v[~alive] = np.nan
    sums, counts = dense_groupby_sums(
        jnp.asarray(idx), jnp.asarray(alive), [jnp.asarray(v)], domain,
        interpret=True)
    assert int(counts[0]) == 100 and int(counts[1]) == 0
    assert float(sums[0][0]) == 100.0


def test_compensation_precision():
    """Alternating large/small magnitudes: naive f32 accumulation drifts
    ~1e-4 relative; the two-float compensated kernel must stay ~f64-exact."""
    rng = np.random.default_rng(1)
    n = 1 << 16
    v = np.where(np.arange(n) % 2 == 0, 1e8, 1e-3) * (1 + rng.random(n))
    idx = np.zeros(n, np.int64)
    alive = np.ones(n, bool)
    sums, _ = dense_groupby_sums(
        jnp.asarray(idx), jnp.asarray(alive), [jnp.asarray(v)], 1,
        interpret=True)
    exact = float(np.sum(v))
    assert abs(float(sums[0][0]) - exact) / exact < 1e-10


def test_dense_groupby_dispatch_equivalence():
    """G.dense_groupby(use_pallas=True) must agree with the XLA broadcast
    lowering on an eligible spec set, and fall back cleanly on MIN/MAX."""
    rng = np.random.default_rng(2)
    n, domain = 4000, 5
    idx = jnp.asarray(rng.integers(0, domain, n))
    alive = jnp.asarray(rng.random(n) < 0.9)
    v = jnp.asarray(rng.random(n) * 10)
    specs = [("sum", v, None), ("count", None, None), ("avg", v, None)]
    occ_a, res_a = G.dense_groupby(idx, domain, specs, alive, use_pallas=True)
    occ_b, res_b = G.dense_groupby(idx, domain, specs, alive, use_pallas=False)
    assert np.array_equal(np.asarray(occ_a), np.asarray(occ_b))
    for (da, na), (db, nb) in zip(res_a, res_b):
        np.testing.assert_allclose(np.asarray(da, dtype=np.float64),
                                   np.asarray(db, dtype=np.float64),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(na), np.asarray(nb))
    # MIN present -> pallas path ineligible, still correct via fallback
    specs2 = [("min", v, None), ("sum", v, None)]
    occ_c, res_c = G.dense_groupby(idx, domain, specs2, alive, use_pallas=True)
    occ_d, res_d = G.dense_groupby(idx, domain, specs2, alive, use_pallas=False)
    for (da, _), (db, _) in zip(res_c, res_d):
        np.testing.assert_allclose(np.asarray(da, np.float64),
                                   np.asarray(db, np.float64), rtol=1e-10)


def test_q1_end_to_end_with_flag():
    """TPC-H Q1 shape through the engine with use_pallas_groupby on (interpret
    mode on CPU) matches the default path row-for-row."""
    from quickstep_tpu import Database
    from quickstep_tpu.bench.tpch import load_tpch, TPCH_QUERIES

    dflt = Database()
    load_tpch(dflt, scale=0.01, seed=0)
    fast = Database()
    fast.config.use_pallas_groupby = True
    load_tpch(fast, scale=0.01, seed=0)
    a = dflt.execute(TPCH_QUERIES[1]).rows
    b = fast.execute(TPCH_QUERIES[1]).rows
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        for x, y in zip(ra, rb):
            if isinstance(x, float):
                assert abs(x - y) <= 1e-9 * max(1.0, abs(x))
            else:
                assert x == y
