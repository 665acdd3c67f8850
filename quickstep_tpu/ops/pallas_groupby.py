"""Pallas TPU kernel: single-pass dense group-by multi-aggregate.

The Q1-class hot loop (reference AggregationOperationState.cpp bulk path +
CollisionFreeVectorTable, SURVEY.md §3.3): one streamed pass over
(group-index, mask, K value columns) folding per-group SUM/COUNT state in VMEM
scratch, instead of the XLA broadcast lowering that re-walks a
(domain × n) one-hot per aggregate.

f64 strategy: the TPU VPU has no native f64 (XLA emulates it ~8x slower than
f32), so each DOUBLE column is split outside the kernel into an exact two-float
(hi, lo) pair — hi = f32(v), lo = f32(v - f64(hi)) — and the kernel accumulates
each part per lane with Neumaier compensation (TwoSum error tracking). The
exported (acc, err) pairs recombine in f64 outside the kernel; end-to-end
group-sum error is ~2^-45 relative, far inside the SQL oracle tolerance, while
every in-kernel op is native f32.

Grid steps on TPU run sequentially per core, so carrying accumulators across
steps in scratch is sound (same pattern as ops/pallas_scan.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TILE = 2048          # elements per grid step -> (16, 128) f32 blocks
MAX_DOMAIN = 16      # static upper bound on dense group domain for this path


def _twosum(acc, err, x):
    """Neumaier compensated add of partial x into (acc, err), lane-wise."""
    s = acc + x
    big = jnp.abs(acc) >= jnp.abs(x)
    e = jnp.where(big, (acc - s) + x, (x - s) + acc)
    return s, err + e


def _make_kernel(domain: int, n_cols: int):
    rows_per_group = 4 * n_cols + 1   # [hi_acc, hi_err, lo_acc, lo_err]*K + cnt

    def kernel(idx_ref, mask_ref, *rest):
        val_refs = rest[:2 * n_cols]
        out_ref = rest[2 * n_cols]
        acc_ref = rest[2 * n_cols + 1]
        i = pl.program_id(0)
        n_steps = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        idx = idx_ref[:]                   # (TILE//LANE, LANE) int32
        mask = mask_ref[:]                 # (TILE//LANE, LANE) f32 0/1
        sub = idx.shape[0]
        for g in range(domain):
            m = jnp.where(idx == g, mask, 0.0)
            base = g * rows_per_group
            for k in range(n_cols):
                hi = val_refs[2 * k][:]
                lo = val_refs[2 * k + 1][:]
                # fully-compensated fold: every sublane row TwoSums straight
                # into the lane accumulators (a plain f32 tile partial first
                # loses low bits the compensation can never recover).
                # where (not *) so inf/nan in dead lanes cannot poison sums
                r = base + 4 * k
                a_hi, e_hi = acc_ref[r, :], acc_ref[r + 1, :]
                a_lo, e_lo = acc_ref[r + 2, :], acc_ref[r + 3, :]
                for row in range(sub):      # static unroll (TILE//LANE)
                    a_hi, e_hi = _twosum(
                        a_hi, e_hi, jnp.where(m[row] > 0, hi[row], 0.0))
                    a_lo, e_lo = _twosum(
                        a_lo, e_lo, jnp.where(m[row] > 0, lo[row], 0.0))
                acc_ref[r, :] = a_hi
                acc_ref[r + 1, :] = e_hi
                acc_ref[r + 2, :] = a_lo
                acc_ref[r + 3, :] = e_lo
            cnt_r = base + 4 * n_cols
            acc_ref[cnt_r, :] = acc_ref[cnt_r, :] + jnp.sum(m, axis=0)

        @pl.when(i == n_steps - 1)
        def _():
            out_ref[:] = acc_ref[:]

    return kernel, rows_per_group


@functools.partial(jax.jit,
                   static_argnames=("domain", "n_cols", "interpret"))
def _run(idx2d, mask2d, split_vals, domain, n_cols, interpret):
    kernel, rows_per_group = _make_kernel(domain, n_cols)
    sub = TILE // LANE
    grid = (idx2d.shape[0] // sub,)
    # index maps must stay int32: with jax_enable_x64 on (the SQL engine
    # enables it globally) a literal `0` traces as i64 and the on-chip Mosaic
    # lowering dies with "failed to legalize 'func.return' (i32, i64)".
    zero = np.int32(0)
    blk = lambda: pl.BlockSpec((sub, LANE), lambda i: (i, zero),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk(), blk()] + [blk() for _ in range(2 * n_cols)],
        out_specs=pl.BlockSpec(
            (domain * rows_per_group, LANE), lambda i: (zero, zero),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((domain * rows_per_group, LANE),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((domain * rows_per_group, LANE),
                                   jnp.float32)],
        interpret=interpret,
    )(idx2d, mask2d, *split_vals)
    return out


def dense_groupby_sums(idx, alive, vals, domain: int, interpret: bool = False):
    """Per-group compensated sums + counts in one Pallas pass.

    idx:  int[n] dense group index (rows with idx outside [0, domain) or
          alive=False contribute nothing)
    vals: list of f64[n] aggregate inputs
    Returns (sums: f64[K][domain], counts: i64[domain]).
    """
    n = idx.shape[0]
    n_cols = len(vals)
    pad = (-n) % TILE
    live = alive & (idx >= 0) & (idx < domain)
    idxp = jnp.pad(idx.astype(jnp.int32), (0, pad))
    maskp = jnp.pad(live.astype(jnp.float32), (0, pad))
    split = []
    for v in vals:
        v = jnp.asarray(v)
        hi = v.astype(jnp.float32)
        lo = (v - hi.astype(v.dtype)).astype(jnp.float32)
        # zero padded/dead lanes so hi*m is finite even for garbage slots
        split.append(jnp.pad(hi, (0, pad)))
        split.append(jnp.pad(lo, (0, pad)))
    shape2d = ((n + pad) // LANE, LANE)
    out = _run(idxp.reshape(shape2d), maskp.reshape(shape2d),
               tuple(s.reshape(shape2d) for s in split),
               domain, n_cols, interpret)
    rows_per_group = 4 * n_cols + 1
    out = out.reshape(domain, rows_per_group, LANE).astype(jnp.float64)
    sums = []
    for k in range(n_cols):
        r = 4 * k
        sums.append(jnp.sum(out[:, r, :] + out[:, r + 1, :]
                            + out[:, r + 2, :] + out[:, r + 3, :], axis=1))
    counts = jnp.sum(out[:, 4 * n_cols, :], axis=1).astype(jnp.int64)
    return sums, counts
