"""Scan phase profile (VERDICT r2 item 3): where do the 52.7 ps/elem go?

The 268M scan runs ~71-79 GB/s in-size vs the ~370 GB/s copy ceiling.
NOTES' scan-floor paragraph gestures at "extraction/recombination glue +
the (R,1) column scan + small-matmul MXU rate" without phase numbers.
This lab measures each phase as its own chained kernel at the production
geometry (512-row blocks), then prices two variants:

  half16: TWO f32 matmuls on 16-bit half-planes instead of four bf16 byte
      planes. Exact: halves <= 65535 are exact in f32, row prefix sums
      <= 128*65535 = 8388480 < 2^24 exact in f32 accumulation, and the
      u32 recombination lo + (hi << 16) wraps exactly. Mosaic decomposes
      an f32 matmul into bf16 passes internally (3x each, so ~6 bf16-
      equivalents vs 4 — MXU work rises ~1.5x) but the VPU glue HALVES:
      2 extractions + 1 shift-add vs 4 + 3.
  excl-U: strict upper-triangular U (l < j) makes each matmul emit the
      EXCLUSIVE in-row prefix directly, dropping the full-tile `inc - x`
      subtract from the exclusive conversion (totals come from
      exc[:, -1] + x[:, -1], a narrow op).

Usage (real TPU): python proto/scan_phase_lab.py [n] [block_rows]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from glu_tpu.ops._pallas_common import LANES, cdiv, round_up

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 28
BR = int(sys.argv[2]) if len(sys.argv) > 2 else 512


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


def _tri(strict=False, dtype=jnp.bfloat16):
    r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    off = 0 if strict else 1
    return jnp.clip(c - r + off, 0, 1).astype(dtype)


DN = (((1,), (0,)), ((), ()))


def _rows_scan(x):
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    s = 1
    while s < x.shape[-2]:
        x = x + jnp.where(rows >= s, pltpu.roll(x, s, axis=x.ndim - 2), 0)
        s *= 2
    return x


def make_kernel(mode):
    def body(x_ref, o_ref, carry_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            carry_ref[0] = jnp.zeros((), jnp.uint32)

        x = x_ref[:]
        xi = pltpu.bitcast(x, jnp.int32)
        carry = carry_ref[0]

        if mode == "copy":
            o_ref[:] = x + carry  # consume carry so the scratch isn't DCE'd
            carry_ref[0] = carry + x[BR - 1, LANES - 1]
            return

        if mode == "extract4":
            acc = jnp.zeros(x.shape, jnp.float32)
            for b_ in range(4):
                acc = acc + ((xi >> (8 * b_)) & 0xFF).astype(jnp.bfloat16).astype(jnp.float32)
            o_ref[:] = pltpu.bitcast(acc.astype(jnp.int32), jnp.uint32) + carry
            carry_ref[0] = carry + x[BR - 1, LANES - 1]
            return

        if mode == "matmul4":
            u = _tri()
            acc = jnp.zeros(x.shape, jnp.float32)
            for b_ in range(4):
                plane = ((xi >> (8 * b_)) & 0xFF).astype(jnp.bfloat16)
                acc = acc + jax.lax.dot_general(plane, u, DN, preferred_element_type=jnp.float32)
            o_ref[:] = pltpu.bitcast(acc.astype(jnp.int32), jnp.uint32) + carry
            carry_ref[0] = carry + x[BR - 1, LANES - 1]
            return

        if mode in ("inrow4", "full4", "full4exclU"):
            u = _tri(strict=(mode == "full4exclU"))
            out = jnp.zeros(x.shape, jnp.uint32)
            for b_ in range(4):
                plane = ((xi >> (8 * b_)) & 0xFF).astype(jnp.bfloat16)
                y = jax.lax.dot_general(plane, u, DN, preferred_element_type=jnp.float32)
                out = out + (pltpu.bitcast(y.astype(jnp.int32), jnp.uint32) << (8 * b_))
            if mode == "inrow4":
                o_ref[:] = out + carry
                carry_ref[0] = carry + x[BR - 1, LANES - 1]
                return
            if mode == "full4":
                inc = out
                totals = inc[:, LANES - 1 : LANES]
                row_prefix = _rows_scan(totals) - totals
                inc = inc + row_prefix
                o_ref[:] = inc - x + carry
                carry_ref[0] = carry + inc[BR - 1, LANES - 1]
                return
            # full4exclU: matmuls already exclusive in-row
            exc = out
            totals = exc[:, LANES - 1 : LANES] + x[:, LANES - 1 : LANES]
            row_prefix = _rows_scan(totals) - totals
            o_ref[:] = exc + row_prefix + carry
            carry_ref[0] = carry + (_rows_scan(totals))[BR - 1, 0]
            return

        if mode in ("fakerp", "colnarrow", "colwide", "colmxu"):
            u = _tri()
            out = jnp.zeros(x.shape, jnp.uint32)
            for b_ in range(4):
                plane = ((xi >> (8 * b_)) & 0xFF).astype(jnp.bfloat16)
                y = jax.lax.dot_general(plane, u, DN, preferred_element_type=jnp.float32)
                out = out + (pltpu.bitcast(y.astype(jnp.int32), jnp.uint32) << (8 * b_))
            inc = out
            totals = inc[:, LANES - 1 : LANES]
            if mode == "fakerp":
                # NO column scan: wrong result, isolates its cost
                row_prefix = totals
            elif mode == "colnarrow":
                from glu_tpu.ops._pallas_common import narrow_cumsum_incl
                row_prefix = narrow_cumsum_incl(totals, BR) - totals
            elif mode == "colwide":
                # full-width sublane scan of the REPLICATED totals: 128x
                # redundant lanes but no narrow-layout pathology
                wide = jax.lax.broadcast_in_dim(totals, (BR, LANES), (0, 1))
                row_prefix = (_rows_scan(wide) - wide)[:, 0:1]
            else:  # colmxu: byte-plane MXU prefix of totals as a (BR/128,128) tile
                g = BR // LANES
                t2 = totals.reshape(g, LANES)
                ti = pltpu.bitcast(t2, jnp.int32)
                acc = jnp.zeros((g, LANES), jnp.uint32)
                for b_ in range(4):
                    pl_ = ((ti >> (8 * b_)) & 0xFF).astype(jnp.bfloat16)
                    y = jax.lax.dot_general(pl_, u, DN, preferred_element_type=jnp.float32)
                    acc = acc + (pltpu.bitcast(y.astype(jnp.int32), jnp.uint32) << (8 * b_))
                gt = acc[:, LANES - 1 : LANES]  # (g,1) group totals (incl)
                gp = _rows_scan(gt) - gt        # exclusive group prefix
                row_prefix = (acc + gp - t2).reshape(BR, 1)
            inc2 = inc + row_prefix
            o_ref[:] = inc2 - x + carry
            carry_ref[0] = carry + inc2[BR - 1, LANES - 1]
            return

        if mode == "best":
            # colwide + strict-U exclusive matmuls
            u = _tri(strict=True)
            out = jnp.zeros(x.shape, jnp.uint32)
            for b_ in range(4):
                plane = ((xi >> (8 * b_)) & 0xFF).astype(jnp.bfloat16)
                y = jax.lax.dot_general(plane, u, DN, preferred_element_type=jnp.float32)
                out = out + (pltpu.bitcast(y.astype(jnp.int32), jnp.uint32) << (8 * b_))
            exc = out
            totals = exc[:, LANES - 1 : LANES] + x[:, LANES - 1 : LANES]
            wide = jax.lax.broadcast_in_dim(totals, (BR, LANES), (0, 1))
            winc = _rows_scan(wide)
            row_prefix = (winc - wide)[:, 0:1]
            o_ref[:] = exc + row_prefix + carry
            carry_ref[0] = carry + winc[BR - 1, 0]
            return

        if mode in ("inrow16", "full16"):
            u32 = _tri(dtype=jnp.float32)
            lo = (xi & 0xFFFF).astype(jnp.float32)
            hi = ((xi >> 16) & 0xFFFF).astype(jnp.float32)
            ylo = jax.lax.dot_general(lo, u32, DN, preferred_element_type=jnp.float32)
            yhi = jax.lax.dot_general(hi, u32, DN, preferred_element_type=jnp.float32)
            out = pltpu.bitcast(ylo.astype(jnp.int32), jnp.uint32) + (
                pltpu.bitcast(yhi.astype(jnp.int32), jnp.uint32) << 16
            )
            if mode == "inrow16":
                o_ref[:] = out + carry
                carry_ref[0] = carry + x[BR - 1, LANES - 1]
                return
            inc = out
            totals = inc[:, LANES - 1 : LANES]
            row_prefix = _rows_scan(totals) - totals
            inc = inc + row_prefix
            o_ref[:] = inc - x + carry
            carry_ref[0] = carry + inc[BR - 1, LANES - 1]
            return

        raise ValueError(mode)

    return body


def make_fn(mode, block_rows):
    kernel = make_kernel(mode)

    def fn(x):
        n = x.shape[0]
        rows = round_up(cdiv(n, LANES), block_rows)
        x2 = x.reshape(rows, LANES)
        return pl.pallas_call(
            kernel,
            grid=(rows // block_rows,),
            in_specs=[pl.BlockSpec((block_rows, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block_rows, LANES), lambda b: (b, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.uint32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.uint32)],
        )(x2).reshape(-1)[:n]

    return fn


def main():
    print(f"device={jax.devices()[0].device_kind} n={N} block_rows={BR}")
    rng = np.random.default_rng(0)
    hx = rng.integers(0, 1 << 32, N, dtype=np.uint32)
    x = jnp.asarray(hx)
    m = 8 * LANES
    exp_exc = np.concatenate([[0], np.cumsum(hx[: m - 1], dtype=np.uint32)]).astype(np.uint32)
    iters = max(8, min(64, (1 << 30) // N))
    modes = ["copy", "colwide", "best"]
    for mode in modes:
        fn = make_fn(mode, BR)
        out = fn(x)
        note = ""
        if mode.startswith(("full", "col")):
            ok = bool((np.asarray(out[:m]) == exp_exc).all())
            note = f" correct={ok}"
        dt = chain_time(fn, x, iters)
        print(f"{mode:11s}: {dt*1e3:8.3f} ms  {4*N/dt/1e9:6.1f} GB/s in-size  "
              f"{dt/N*1e12:6.1f} ps/elem{note}", flush=True)


if __name__ == "__main__":
    main()
