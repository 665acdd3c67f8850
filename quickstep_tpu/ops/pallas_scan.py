"""Pallas TPU kernel: streaming masked scan-aggregate.

The hot loop of scan+filter+aggregate queries (reference SelectWorkOrder::execute ->
predicate -> accumulate, SURVEY.md §3.3) as a hand-scheduled TPU kernel: column tiles
stream HBM->VMEM through the pallas pipeline while the VPU folds a running
(count, sum, min, max) state in VMEM scratch — one pass, no intermediate arrays.

Used for FLOAT/INT aggregate inputs (f32/i32 are VPU-native; DOUBLE stays on the
XLA path where f64 emulation is handled by the compiler). Grid iterations on TPU
execute sequentially per core, so carrying the accumulator across grid steps in
scratch is sound (guide: Grid/BlockSpecs; double-buffering of input tiles is done
by pallas's own pipeline when using a blocked grid spec).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8
TILE = 2048  # rows per grid step (TILE/LANE sublane rows of f32)


def _scan_kernel(vals_ref, mask_ref, out_ref, acc_ref):
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0, :] = jnp.zeros((LANE,), jnp.float32)           # sum
        acc_ref[1, :] = jnp.zeros((LANE,), jnp.float32)           # count
        acc_ref[2, :] = jnp.full((LANE,), jnp.inf, jnp.float32)   # min
        acc_ref[3, :] = jnp.full((LANE,), -jnp.inf, jnp.float32)  # max

    v = vals_ref[:]                       # (TILE//LANE, LANE) f32
    m = mask_ref[:]                       # (TILE//LANE, LANE) f32 0/1
    contrib = v * m
    acc_ref[0, :] = acc_ref[0, :] + jnp.sum(contrib, axis=0)
    acc_ref[1, :] = acc_ref[1, :] + jnp.sum(m, axis=0)
    acc_ref[2, :] = jnp.minimum(
        acc_ref[2, :], jnp.min(jnp.where(m > 0, v, jnp.inf), axis=0))
    acc_ref[3, :] = jnp.maximum(
        acc_ref[3, :], jnp.max(jnp.where(m > 0, v, -jnp.inf), axis=0))

    @pl.when(i == n_steps - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_scan_agg(vals2d, mask2d, interpret=False):
    rows = vals2d.shape[0]
    grid = (rows // (TILE // LANE),)
    out = pl.pallas_call(
        _scan_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE // LANE, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE // LANE, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, LANE), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, LANE), jnp.float32)],
        interpret=interpret,
    )(vals2d, mask2d)
    total_sum = jnp.sum(out[0])
    total_cnt = jnp.sum(out[1]).astype(jnp.int64)
    total_min = jnp.min(out[2])
    total_max = jnp.max(out[3])
    return total_sum, total_cnt, total_min, total_max


def scan_aggregate(vals, mask, interpret: bool = False):
    """Fused (sum, count, min, max) of f32 `vals` rows where `mask` is live.

    vals: 1-D f32/int32 array (int cast to f32); mask: bool. Pads internally to
    the tile size. Returns (sum f32, count i64, min f32, max f32) — min/max are
    +inf/-inf when count == 0 (caller nulls them).
    """
    v = jnp.asarray(vals, jnp.float32)
    m = jnp.asarray(mask)
    n = v.shape[0]
    padded = ((n + TILE - 1) // TILE) * TILE
    if padded != n:
        v = jnp.pad(v, (0, padded - n))
        m = jnp.pad(m, (0, padded - n))
    v2 = v.reshape(-1, LANE)
    m2 = m.astype(jnp.float32).reshape(-1, LANE)
    return _pallas_scan_agg(v2, m2, interpret=interpret)
