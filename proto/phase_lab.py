"""Phase isolation for the production 1-bit split (round 3: R=512, wide
Zin column scan, packed-byte cums — pass R as argv[2] to sweep).

Each variant removes one phase (replacing it with a cheap stand-in) so the
difference vs the full split prices that phase. Results are WRONG sorts —
timing only. Chained timing per the verify recipe.

Variants:
  full     — production _split_round (baseline)
  nocums   — cumZ replaced by lanes+1 (prices the 7-step roll cumsum)
  nosearch — lo = lanes identity (prices the 7-probe binary search)
  noshift  — colshift skipped (prices the 2x10-step masked roll walk)
  noroute  — route gathers replaced by pass-through (prices route)
  mxucums  — cumZ via MXU triangular matmul (the candidate replacement)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from glu_tpu.ops import _pallas_sort as ps

R = int(sys.argv[2]) if len(sys.argv) > 2 else 512
LANES = 128
NBLOCKS = 8388608 // (R * 128)
N = NBLOCKS * R * LANES


def fence(x):
    np.asarray(jax.tree.leaves(x)[0][:1])


def chain_time(fn, args, iters=24):
    def chained(it):
        @jax.jit
        def g(state):
            return jax.lax.fori_loop(0, it, lambda i, s: fn(*s), state)
        return g
    g1, gn = chained(1), chained(1 + iters)
    fence(g1(args)); fence(gn(args))
    def t(g):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); fence(g(args)); best = min(best, time.perf_counter() - t0)
        return best
    return (t(gn) - t(g1)) / iters


def mxu_cumZ(z):
    zb = z.astype(jnp.bfloat16)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    # arithmetic triu: an i1 iota-compare mask consumed by a bf16 matmul
    # trips a Mosaic relayout bug (round-1 fault)
    triu = jnp.clip(c_i - r_i + 1, 0, 1).astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        zb, triu, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y.astype(jnp.int32)


def make_split(variant):
    def split(k, v, bit):
        lanes = ps._lanes((R, LANES))
        rows = ps._rows((R, LANES))
        z = 1 - bit
        if variant == "nocums":
            # wrong values, right shape/dtype; data-dependent (a pure-iota
            # stand-in hits a Mosaic AOT layout assert)
            cumZ = z + pltpu.roll(z, 1, axis=1)
        elif variant == "mxucums":
            cumZ = mxu_cumZ(z)
        else:
            cumZ = ps._packed4_inrow_cumsum(z)
        c0 = cumZ[:, LANES - 1 : LANES]
        if variant == "nozin":
            Zin = c0  # wrong values; prices the wide Zin column scan
        elif variant == "zin16":
            # 2-group 16-bit packed wide column scan: rows r and r+R/2 share
            # one u32 (prefix sums <= R/2*128 = 32768 fit 16 bits at R<=512),
            # so the scan runs 1 fewer step on HALF the rows
            H = R // 2
            wide = jax.lax.broadcast_in_dim(c0, (R, LANES), (0, 1))
            packed = wide[:H] + (wide[H:] << 16)
            rws = jax.lax.broadcasted_iota(jnp.int32, (H, LANES), 0)
            sstep = 1
            while sstep < H:
                packed = packed + jnp.where(rws >= sstep, pltpu.roll(packed, sstep, axis=0), 0)
                sstep *= 2
            lo16 = packed & 0xFFFF
            hi16 = (packed >> 16) & 0xFFFF
            total_lo = lo16[H - 1 : H, :]
            Zin = jnp.concatenate([lo16, hi16 + total_lo], axis=0)[:, 0:1]
        else:
            Zin = ps._col_prefix_wide(c0, R)
        Zex = Zin - c0
        n0 = Zin[R - 1, 0]
        Oex = ps._rows((R, 1)) * LANES - Zex

        is_zero_slot = lanes < c0
        if variant == "nosearch":
            lo = lanes
        else:
            target = jnp.where(is_zero_slot, lanes + 1, lanes - c0 + 1)
            lo = jnp.zeros((R, LANES), jnp.int32)
            step = LANES // 2
            while step >= 1:
                mid = lo + step - 1
                cz = jnp.take_along_axis(cumZ, mid, axis=1)
                cm = jnp.where(is_zero_slot, cz, mid + 1 - cz)
                lo = jnp.where(cm < target, lo + step, lo)
                step //= 2
        gk = jnp.take_along_axis(k, lo, axis=1)
        gv = jnp.take_along_axis(v, lo, axis=1)

        def route(Fc, base, cnt):
            if variant == "noroute":
                meta = jnp.where(lanes < cnt, ((jnp.abs(Fc - rows)) << 1) | 1, 0)
                return gk, gv, meta
            rank = (lanes - Fc) & (LANES - 1)
            src = jnp.clip(base + rank, 0, LANES - 1)
            rk = jnp.take_along_axis(gk, src, axis=1)
            rv = jnp.take_along_axis(gv, src, axis=1)
            valid = rank < cnt
            q = (Fc >> 7) + jnp.where(lanes < (Fc & (LANES - 1)), 1, 0)
            d = jnp.where(valid, jnp.abs(q - rows), 0)
            meta = jnp.where(valid, (d << 1) | 1, 0)
            return rk, rv, meta

        def colshift(rk, rv, meta, up):
            if variant == "noshift":
                return rk, rv
            s = 1
            while s < R:
                t = (R - s) % R if up else s
                rk_s = pltpu.roll(rk, t, axis=0)
                m_s = pltpu.roll(meta, t, axis=0)
                arrive = jnp.logical_and((m_s & 1) == 1, ((m_s >> 1) & s) != 0)
                stay = ((meta >> 1) & s) == 0
                rk = jnp.where(arrive, rk_s, rk)
                rv = jnp.where(arrive, pltpu.roll(rv, t, axis=0), rv)
                meta = jnp.where(arrive, m_s - (s << 1), jnp.where(stay, meta, 0))
                s *= 2
            return rk, rv

        zk, zv, zmeta = route(Zex, jnp.zeros((R, 1), jnp.int32), c0)
        ok_, ov_, ometa = route(jnp.int32(n0) + Oex, c0, LANES - c0)
        zk, zv = colshift(zk, zv, zmeta, up=True)
        ok_, ov_ = colshift(ok_, ov_, ometa, up=False)
        sel = (rows * LANES + lanes) < n0
        return jnp.where(sel, zk, ok_), jnp.where(sel, zv, ok_ if variant == "x" else ov_)
    return split


def make_group(split_fn, nbits=4):
    data_spec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((NBLOCKS * R, LANES), jnp.uint32)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def kernel(k_ref, v_ref, ok_ref, ov_ref):
        k, v = k_ref[:], v_ref[:]
        for b in range(nbits):
            bit = ((k >> jnp.uint32(b)) & jnp.uint32(1)).astype(jnp.int32)
            k, v = split_fn(k, v, bit)
        ok_ref[:] = k
        ov_ref[:] = v

    def fn(k2, v2):
        return pl.pallas_call(
            kernel, grid=(NBLOCKS,), in_specs=[data_spec, data_spec],
            out_specs=[data_spec, data_spec], out_shape=[shape, shape],
            compiler_params=params)(k2, v2)
    return fn


if __name__ == "__main__":
    want = ([sys.argv[1]] if len(sys.argv) > 1 and sys.argv[1] != "-" else
            ["full", "nozin", "zin16"])
    rng = np.random.default_rng(1)
    k2 = jnp.asarray(rng.integers(0, 1 << 32, (NBLOCKS * R, LANES), dtype=np.uint32))
    v2 = jnp.asarray(np.arange(N, dtype=np.uint32).reshape(NBLOCKS * R, LANES))
    base = None
    for name in want:
        fn = make_group(make_split(name))
        t = chain_time(lambda a, b: tuple(fn(a, b)), (k2, v2))
        ps_elem = t / N * 1e12 / 4
        msg = f"{name:9s}: {t*1e3:8.3f} ms/pass  {ps_elem:6.1f} ps/elem/split"
        if name == "full":
            base = ps_elem
        elif base is not None:
            msg += f"  (delta vs full: {base - ps_elem:+6.1f})"
        print(msg, flush=True)
