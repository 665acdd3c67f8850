"""Pallas streaming scan-aggregate kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

from quickstep_tpu.ops.pallas_scan import scan_aggregate


def test_scan_aggregate_matches_numpy():
    rng = np.random.default_rng(0)
    n = 5000
    vals = rng.uniform(-100, 100, n).astype(np.float32)
    mask = rng.random(n) < 0.4
    s, c, lo, hi = scan_aggregate(vals, mask, interpret=True)
    assert int(c) == int(mask.sum())
    assert np.isclose(float(s), float(vals[mask].sum()), rtol=1e-4)
    assert np.isclose(float(lo), float(vals[mask].min()))
    assert np.isclose(float(hi), float(vals[mask].max()))


def test_scan_aggregate_empty_mask():
    vals = np.ones(100, np.float32)
    mask = np.zeros(100, bool)
    s, c, lo, hi = scan_aggregate(vals, mask, interpret=True)
    assert int(c) == 0
    assert float(s) == 0.0
    assert float(lo) == np.inf and float(hi) == -np.inf


def test_scan_aggregate_exact_tile():
    vals = np.arange(2048, dtype=np.float32)
    mask = np.ones(2048, bool)
    s, c, lo, hi = scan_aggregate(vals, mask, interpret=True)
    assert int(c) == 2048
    assert float(s) == float(vals.sum())
    assert float(lo) == 0.0 and float(hi) == 2047.0
