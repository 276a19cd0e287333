"""Perf lab: MXU byte-plane in-row prefix vs the lane roll-scan.

The scan kernel's floor is the 7-step lane roll-scan (~42-50 ps/elem,
NOTES.md "Scan floor"). Candidate replacement: inclusive prefix along
lanes as Y = sum_b 2^(8b) * (X_b @ U), where X_b are the 4 byte planes of
the u32 tile (bytes 0..255 are EXACT in bf16 — 8 significant bits) and
U[l, j] = [l <= j] is the 128x128 upper-triangular ones matrix (built
arithmetically: i1 iota-compare masks feeding bf16 matmuls trip a Mosaic
relayout bug). Each plane's row-prefix sums are <= 128*255 = 32640, exact
in the MXU's f32 accumulation, and f32 -> u32 conversion is exact below
2^24; the final recombination wraps mod 2^32 in u32 as required.

Contrast with NOTES' earlier pricing (~136 ps/elem) which was measured on
the SPLIT's geometry; here the operand is already (R, 128) with lanes as
the natural contraction dim, so no relayout should be needed.

Usage: python proto/scan_mxu_lab.py [n]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from glu_tpu.ops._pallas_common import LANES, cdiv, col_ids, round_up


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


def _scan_rows_inclusive(x):
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    s = 1
    while s < x.shape[-2]:
        x = x + jnp.where(rows >= s, pltpu.roll(x, s, axis=x.ndim - 2), 0)
        s *= 2
    return x


def _tri_u_bf16():
    """U[l, j] = 1.0 if l <= j else 0.0, built arithmetically (no i1 mask)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return jnp.clip(c - r + 1, 0, 1).astype(jnp.bfloat16)


def _mxu_lane_scan(x):
    """Inclusive in-row prefix of a (R, 128) u32 tile via 4 byte-plane
    bf16 matmuls (exact, wrapping)."""
    u = _tri_u_bf16()
    xi = x.astype(jnp.int32) if x.dtype == jnp.uint32 else x
    dn = (((1,), (0,)), ((), ()))
    out = jnp.zeros(x.shape, jnp.uint32)
    for b in range(4):
        plane = ((xi >> (8 * b)) & 0xFF).astype(jnp.bfloat16)
        y = jax.lax.dot_general(plane, u, dn, preferred_element_type=jnp.float32)
        # Mosaic has no f32->u32 cast; go through i32 (exact: y <= 32640)
        yi = pltpu.bitcast(y.astype(jnp.int32), jnp.uint32)
        out = out + (yi << (8 * b))
    return out


def _tri_u_s8():
    r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return jnp.clip(c - r + 1, 0, 1).astype(jnp.int8)


def _mxu8_lane_scan(x):
    """int8-MXU variant: planes biased by -128 into s8; the bias correction
    is 128*(j+1) per output lane j (U's column sums), a constant row."""
    u = _tri_u_s8()
    xi = x.astype(jnp.int32) if x.dtype == jnp.uint32 else x
    dn = (((1,), (0,)), ((), ()))
    corr = (jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) + 1) * 128
    out = jnp.zeros(x.shape, jnp.uint32)
    for b in range(4):
        plane = (((xi >> (8 * b)) & 0xFF) - 128).astype(jnp.int8)
        y = jax.lax.dot_general(plane, u, dn, preferred_element_type=jnp.int32)
        yi = pltpu.bitcast(y + corr, jnp.uint32)
        out = out + (yi << (8 * b))
    return out


def make_scan(block_rows, mode):
    def tile_scan(x):
        if mode == "mxu8":
            inc = _mxu8_lane_scan(x)
        else:
            inc = _mxu_lane_scan(x) if mode == "mxu" else _lane_scan(x)
        totals = inc[:, LANES - 1 : LANES]
        row_prefix = _scan_rows_inclusive(totals) - totals
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
    m = 8 * LANES
    exp = np.concatenate([[0], np.cumsum(hx[: m - 1], dtype=np.uint32)]).astype(np.uint32)
    iters = max(4, min(32, (1 << 29) // n))
    for block_rows in (512, 1024):
        for mode in ("roll", "mxu", "mxu8"):
            fn = make_scan(block_rows, mode)
            out = fn(x)
            ok = bool((np.asarray(out[:m]) == exp).all())
            dt = chain_time(fn, x, iters)
            print(f"rows={block_rows:5d} {mode:5s}: correct={ok} {dt*1e3:8.3f} ms  "
                  f"{4*n/dt/1e9:6.1f} GB/s in-size  {dt/n*1e12:6.1f} ps/elem", flush=True)
