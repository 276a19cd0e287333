"""Primitive lab 2: dynamic-offset VMEM scratch stores/reads.

The hierarchical-split design needs, inside one kernel iteration:
  - STORE a (C,128) slice of a register value into VMEM scratch at a
    dynamic, sublane-UNALIGNED row offset (src-driven mini-splice), and
  - READ (C,128) slices from scratch at dynamic unaligned offsets.

  dstore  — 32 chunk stores at unaligned dynamic offsets, then read back
  dread   — 32 chunk reads at unaligned dynamic offsets
  rmw     — read-modify-write a single boundary row at a dynamic offset
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
R = 1024
NB = 64
N = NB * R * LANES
C = 32          # micro-chunk rows
NM = R // C     # 32 micros


def fence(x):
    np.asarray(jax.tree.leaves(x)[0][:1])


def chain_time(fn, args, iters=16):
    def chained(it):
        @jax.jit
        def g(state):
            return jax.lax.fori_loop(0, it, lambda i, s: (fn(*s),) + tuple(s[1:]), state)
        return g
    g1, gn = chained(1), chained(1 + iters)
    fence(g1(args)); fence(gn(args))
    def t(g):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); fence(g(args)); best = min(best, time.perf_counter() - t0)
        return best
    return (t(gn) - t(g1)) / iters


# offsets: micro m stored at off[m] = m*C - (m % 5)  (unaligned, overlapping
# by up to 4 rows with the previous chunk's tail; later stores win)
HOST_OFF = np.array([m * C - (m % 5) for m in range(NM)], np.int32)


def expected(x):
    out = np.zeros_like(x)
    for b in range(x.shape[0] // R):
        blk = x[b * R:(b + 1) * R]
        sc = np.zeros((R + 8, LANES), x.dtype)
        for m in range(NM):
            sc[HOST_OFF[m]:HOST_OFF[m] + C] = blk[m * C:(m + 1) * C]
        out[b * R:(b + 1) * R] = sc[:R]
    return out


def run(name, kern, extra_in=(), oracle=None):
    spec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    shape = jax.ShapeDtypeStruct((NB * R, LANES), jnp.uint32)
    rng = np.random.default_rng(0)
    xh = rng.integers(0, 1 << 32, (NB * R, LANES), dtype=np.uint32)
    offs = jnp.asarray(HOST_OFF)

    def fn(x, o):
        return pl.pallas_call(
            kern, grid=(NB,), in_specs=[smem, spec], out_specs=spec, out_shape=shape,
            scratch_shapes=[pltpu.VMEM((R + 8, LANES), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        )(o, x)

    try:
        out = np.asarray(fn(jnp.asarray(xh), offs))
    except Exception as e:
        print(f"{name:8s}: FAIL {type(e).__name__}: {str(e)[:250]}", flush=True)
        return
    ok = (out == oracle(xh)).all() if oracle is not None else "n/a"
    t = chain_time(fn, (jnp.asarray(xh), offs))
    print(f"{name:8s}: correct={ok} {t*1e3:7.3f} ms  {t/N*1e12:6.2f} ps/elem", flush=True)


def main():
    want = sys.argv[1:] or ["dstore", "dread", "rmw"]

    if "dstore" in want:
        def kern(o_ref, x_ref, out_ref, sc):
            val = x_ref[:]
            sc[pl.ds(0, 8), :] = jnp.zeros((8, LANES), jnp.uint32)  # init tail rows
            for m in range(NM):
                sc[pl.ds(o_ref[m], C), :] = val[m * C:(m + 1) * C, :]
            out_ref[:] = sc[pl.ds(0, R), :]

        run("dstore", kern, oracle=expected)

    if "dread" in want:
        def kern(o_ref, x_ref, out_ref, sc):
            sc[pl.ds(0, R), :] = x_ref[:]
            sc[pl.ds(R, 8), :] = jnp.zeros((8, LANES), jnp.uint32)
            acc = jnp.zeros((R, LANES), jnp.uint32)
            parts = []
            for m in range(NM):
                parts.append(sc[pl.ds(o_ref[m], C), :])
            out_ref[:] = jnp.concatenate(parts, axis=0)

        def oracle(x):
            out = np.zeros_like(x)
            for b in range(x.shape[0] // R):
                blk = np.concatenate([x[b * R:(b + 1) * R], np.zeros((8, LANES), x.dtype)])
                out[b * R:(b + 1) * R] = np.concatenate(
                    [blk[HOST_OFF[m]:HOST_OFF[m] + C] for m in range(NM)])
            return out

        run("dread", kern, oracle=oracle)

    if "rmw" in want:
        # boundary blend: for each micro, read one row at dynamic offset,
        # blend half its lanes with new data, write back — the sequential
        # boundary-merge pattern (chain of NM dependent RMWs).
        def kern(o_ref, x_ref, out_ref, sc):
            val = x_ref[:]
            sc[pl.ds(0, R), :] = val
            sc[pl.ds(R, 8), :] = jnp.zeros((8, LANES), jnp.uint32)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            for m in range(NM):
                row = sc[pl.ds(o_ref[m] + 1, 1), :]
                newrow = jnp.where(lanes < 64, row + jnp.uint32(1), row)
                sc[pl.ds(o_ref[m] + 1, 1), :] = newrow
            out_ref[:] = sc[pl.ds(0, R), :]

        run("rmw", kern)


if __name__ == "__main__":
    main()
