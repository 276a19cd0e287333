"""Perf lab: scan-kernel variants on real TPU, chained timing.

Isolates the two round-2 scan changes (block rows 256 -> 1024; sublane
col-scan -> full-width narrow cumsum for the row totals) after the combined
change measured SLOWER than round 1 (23.1 ms vs 15.2 ms at 268M).

Usage: python proto/scan_lab.py [n]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from glu_tpu.ops._pallas_common import LANES, cdiv, col_ids, narrow_cumsum_incl, round_up


def fence(x):
    np.asarray(jax.tree.leaves(x)[0][:1])


def chain_time(fn, x, iters):
    def chained(it):
        @jax.jit
        def g(a):
            return jax.lax.fori_loop(0, it, lambda i, s: fn(s), a)
        return g
    g1, gn = chained(1), chained(1 + iters)
    fence(g1(x)); fence(gn(x))
    def t(g):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); fence(g(x)); best = min(best, time.perf_counter() - t0)
        return best
    return (t(gn) - t(g1)) / iters


def _lane_scan(x):
    cols = col_ids(x.shape)
    s = 1
    while s < x.shape[-1]:
        x = x + jnp.where(cols >= s, pltpu.roll(x, s, axis=x.ndim - 1), jnp.zeros_like(x))
        s *= 2
    return x


def _col_scan(x):
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    s = 1
    while s < x.shape[-2]:
        x = x + jnp.where(rows >= s, pltpu.roll(x, s, axis=x.ndim - 2), jnp.zeros_like(x))
        s *= 2
    return x


def make_scan(block_rows, rowmode):
    def tile_scan(x):
        inc = _lane_scan(x)
        totals = inc[:, LANES - 1 : LANES]
        if rowmode == "narrow":
            row_prefix = narrow_cumsum_incl(totals, x.shape[0]) - totals
        else:
            row_prefix = _col_scan(totals) - totals
        return inc + row_prefix

    def kernel(x_ref, o_ref, carry_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            carry_ref[0] = jnp.zeros((), jnp.uint32)

        x = x_ref[:]
        inc = tile_scan(x)
        carry = carry_ref[0]
        o_ref[:] = inc - x + carry
        carry_ref[0] = carry + inc[x.shape[0] - 1, LANES - 1]

    def fn(x):
        n = x.shape[0]
        rows0 = cdiv(n, LANES)
        rows = round_up(rows0, block_rows)
        x2 = x.reshape(rows, LANES)
        num_blocks = rows // block_rows
        return pl.pallas_call(
            kernel,
            grid=(num_blocks,),
            in_specs=[pl.BlockSpec((block_rows, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block_rows, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.uint32)],
        )(x2).reshape(rows * LANES)[:n]
    return fn


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 28
    rng = np.random.default_rng(0)
    hx = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    x = jnp.asarray(hx)
    exp = np.concatenate([[0], np.cumsum(hx[: 4 * LANES - 1], dtype=np.uint32)]).astype(np.uint32)
    iters = max(4, min(32, (1 << 29) // n))
    for block_rows in (256, 512, 1024):
        for rowmode in ("col", "narrow"):
            fn = make_scan(block_rows, rowmode)
            out = fn(x)
            ok = bool((np.asarray(out[: 4 * LANES]) == exp).all())
            dt = chain_time(fn, x, iters)
            print(f"rows={block_rows:5d} {rowmode:6s}: correct={ok} {dt*1e3:8.3f} ms  "
                  f"{4*n/dt/1e9:6.1f} GB/s in-size", flush=True)
