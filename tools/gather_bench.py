"""Microbench: strategies for gathering k int32 columns by one random index
vector at sizes where the [n,k] row pack blows past PACK_PAD_LIMIT.

Times, at n=8M source rows / m=8M (and 2M) indices:
  a) k separate 1-D int32 gathers          (current fallback)
  b) ceil(k/2) 1-D int64 pair-packed gathers (pack 2 cols per word)
  c) one [n,k] 2-D row gather              (the padded pack, for reference)
  d) sorted-index gather: sort idx, monotone gather, sort back (locality)

Chained-iteration timing per ROUND4_NOTES: K iterations inside one jit with
input perturbation so XLA can't CSE, device_get a scalar.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K_ITERS = 8


def timeit(fn, *args):
    f = jax.jit(fn)
    jax.device_get(f(*args))          # compile + settle
    t0 = time.perf_counter()
    jax.device_get(f(*args))          # device_get forces real completion;
    return (time.perf_counter() - t0) / K_ITERS * 1000


def chain(body):
    def run(cols, idx):
        acc = jnp.zeros((), jnp.int32)
        cur = idx
        for i in range(K_ITERS):
            outs = body(cols, cur)
            s = functools.reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.int32)), outs,
                jnp.zeros((), jnp.int32))
            acc = acc + s
            cur = jnp.roll(cur, 1) + (acc % 2)   # perturb: defeat CSE
        return acc
    return run


def strat_a(cols, idx):
    return [c[idx] for c in cols]


def strat_b(cols, idx):
    outs = []
    for i in range(0, len(cols) - 1, 2):
        a = jax.lax.bitcast_convert_type(cols[i], jnp.uint32).astype(jnp.uint64)
        b = jax.lax.bitcast_convert_type(cols[i + 1], jnp.uint32).astype(jnp.uint64)
        packed = (a << 32) | b
        g = packed[idx]
        outs.append(jax.lax.bitcast_convert_type(
            (g >> 32).astype(jnp.uint32), jnp.int32))
        outs.append(jax.lax.bitcast_convert_type(
            g.astype(jnp.uint32), jnp.int32))
    if len(cols) % 2:
        outs.append(cols[-1][idx])
    return outs


def strat_c(cols, idx):
    packed = jnp.stack(cols, axis=1)
    g = packed[idx]
    return [g[:, j] for j in range(len(cols))]


def strat_d(cols, idx):
    order = jnp.argsort(idx)
    si = idx[order]
    gs = [c[si] for c in cols]
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    return [g[inv] for g in gs]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8 * 1024 * 1024
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rng = np.random.default_rng(0)
    cols = [jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
            for _ in range(k)]
    for m in (n, n // 4):
        idx = jnp.asarray(rng.integers(0, n, m, dtype=np.int32))
        for name, s in (("a:per-col", strat_a), ("b:int64-pair", strat_b),
                        ("c:2d-pack", strat_c), ("d:sorted", strat_d)):
            try:
                ms = timeit(chain(s), cols, idx)
                print(f"n={n} m={m} k={k} {name:12s} {ms:8.2f} ms/iter")
            except Exception as e:
                print(f"n={n} m={m} k={k} {name:12s} FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
