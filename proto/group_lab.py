"""Perf lab: group-kernel variants on real TPU, chained timing.

Usage: python proto/group_lab.py [variant ...]
Variants: v0 (production 4x1-bit split), v1 (MXU triangular-matmul cumsums),
phases (phase isolation: cums/search/route/colshift).

Timing: K group passes chained in one jit(fori_loop); report
(t(1+K) - t(1)) / K per pass and ps/element. One fetch fence per run
(axon tunnel: block_until_ready lies; fetch is the only fence).
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

R = 1024
LANES = 128
NBLOCKS = 64  # 8.4M elements
N = NBLOCKS * R * LANES


def fence(x):
    np.asarray(jax.tree.leaves(x)[0][:1])


def chain_time(fn, args, iters=8):
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


# ---------------------------------------------------------------- variants

def mxu_inrow_cumsum(x_i32):
    """Inclusive in-row cumsum of small nonneg ints via bf16 triangular
    matmul on the MXU (values <= 128 and row sums <= 128: exact in bf16
    operands with f32 accumulation)."""
    tri = jnp.tril(jnp.ones((LANES, LANES), jnp.bfloat16))  # tri[m, l]: m <= ... lower?
    # want cum[l] = sum_{m<=l} x[m] = x @ T where T[m, l] = 1 if m <= l (upper-tri)
    triu = jnp.triu(jnp.ones((LANES, LANES), jnp.bfloat16))
    y = jax.lax.dot_general(
        x_i32.astype(jnp.bfloat16), triu,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.astype(jnp.int32)


def split_round_v1(k, v, bit):
    """_split_round with the in-row cumsum on the MXU."""
    lanes = ps._lanes((R, LANES))
    rows = ps._rows((R, LANES))
    z = 1 - bit
    cumZ = mxu_inrow_cumsum(z)
    c0 = cumZ[:, LANES - 1 : LANES]
    Zin = ps.narrow_cumsum_incl(c0, R)
    Zex = Zin - c0
    n0 = Zin[R - 1, 0]
    Oex = ps._rows((R, 1)) * LANES - Zex

    is_zero_slot = lanes < c0
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
    return jnp.where(sel, zk, ok_), jnp.where(sel, zv, ov_)


def make_group(split_fn, nbits=4):
    """Grid-over-blocks kernel applying nbits sequential 1-bit splits."""
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
            kernel,
            grid=(NBLOCKS,),
            in_specs=[data_spec, data_spec],
            out_specs=[data_spec, data_spec],
            out_shape=[shape, shape],
            compiler_params=params,
        )(k2, v2)
    return fn


def check(fn, nbits=4):
    rng = np.random.default_rng(0)
    hk = rng.integers(0, 1 << 32, (2 * R, LANES), dtype=np.uint32)
    hv = np.arange(2 * R * LANES, dtype=np.uint32).reshape(2 * R, LANES)
    # run per-block oracle
    data_spec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((2 * R, LANES), jnp.uint32)
    def kernel(k_ref, v_ref, ok_ref, ov_ref):
        k, v = k_ref[:], v_ref[:]
        for b in range(nbits):
            bit = ((k >> jnp.uint32(b)) & jnp.uint32(1)).astype(jnp.int32)
            k, v = fn(k, v, bit)
        ok_ref[:] = k; ov_ref[:] = v
    ok, ov = pl.pallas_call(
        kernel, grid=(2,), in_specs=[data_spec, data_spec],
        out_specs=[data_spec, data_spec], out_shape=[shape, shape],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.asarray(hk), jnp.asarray(hv))
    ok, ov = np.asarray(ok), np.asarray(ov)
    good = True
    for b in range(2):
        fk = hk[b * R : (b + 1) * R].reshape(-1)
        fv = hv[b * R : (b + 1) * R].reshape(-1)
        order = np.argsort(fk & ((1 << nbits) - 1), kind="stable")
        good &= (ok[b * R : (b + 1) * R].reshape(-1) == fk[order]).all()
        good &= (ov[b * R : (b + 1) * R].reshape(-1) == fv[order]).all()
    return bool(good)


def bench(name, split_fn, nbits=4):
    okc = check(split_fn, nbits)
    rng = np.random.default_rng(1)
    k2 = jnp.asarray(rng.integers(0, 1 << 32, (NBLOCKS * R, LANES), dtype=np.uint32))
    v2 = jnp.asarray(np.arange(N, dtype=np.uint32).reshape(NBLOCKS * R, LANES))
    fn = make_group(split_fn, nbits)
    t = chain_time(lambda a, b: tuple(fn(a, b)), (k2, v2))
    print(f"{name}: correct={okc} {t*1e3:8.3f} ms/pass  "
          f"{t / N * 1e12 / nbits:7.1f} ps/elem/split", flush=True)


if __name__ == "__main__":
    want = sys.argv[1:] or ["v0", "v1"]
    if "v0" in want:
        bench("v0 production", ps._split_round)
    if "v1" in want:
        bench("v1 mxu-cumsum", split_round_v1)


# ---------------------------------------------------------------- v2: micro-opts
# flagless meta (meta = remaining row delta; 0 = inert), conditional walk
# steps (skip roll rounds no element needs), optional MXU cumsum.

def make_split_v2(use_mxu=False, cond_steps=True):
    def split(k, v, bit):
        R_ = k.shape[0]
        lanes = ps._lanes((R_, LANES))
        rows = ps._rows((R_, LANES))
        z = 1 - bit
        if use_mxu:
            zb = z.astype(jnp.bfloat16)
            r_i = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
            c_i = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
            triu = jnp.clip(c_i - r_i + 1, 0, 1).astype(jnp.bfloat16)
            cumZ = jax.lax.dot_general(
                zb, triu, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
        else:
            cumZ = ps._inrow_cumsum(z)
        c0 = cumZ[:, LANES - 1 : LANES]
        Zin = ps.narrow_cumsum_incl(c0, R_)
        Zex = Zin - c0
        n0 = Zin[R_ - 1, 0]
        Oex = ps._rows((R_, 1)) * LANES - Zex

        is_zero_slot = lanes < c0
        target = jnp.where(is_zero_slot, lanes + 1, lanes - c0 + 1)
        lo = jnp.zeros((R_, LANES), jnp.int32)
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
            rank = (lanes - Fc) & (LANES - 1)
            src = jnp.clip(base + rank, 0, LANES - 1)
            rk = jnp.take_along_axis(gk, src, axis=1)
            rv = jnp.take_along_axis(gv, src, axis=1)
            valid = rank < cnt
            q = (Fc >> 7) + jnp.where(lanes < (Fc & (LANES - 1)), 1, 0)
            meta = jnp.where(valid, jnp.abs(q - rows), 0)   # flagless
            return rk, rv, meta

        zk, zv, zmeta = route(Zex, jnp.zeros((R_, 1), jnp.int32), c0)
        ok_, ov_, ometa = route(jnp.int32(n0) + Oex, c0, LANES - c0)

        if cond_steps:
            need = jnp.max(zmeta | ometa)   # OR of delta bits present

        def colshift(rk, rv, meta, up):
            s = 1
            while s < R_:
                t = (R_ - s) % R_ if up else s

                def do_step(args):
                    rk, rv, meta = args
                    rk_s = pltpu.roll(rk, t, axis=0)
                    m_s = pltpu.roll(meta, t, axis=0)
                    arrive = (m_s & s) != 0
                    stay = (meta & s) == 0
                    rk = jnp.where(arrive, rk_s, rk)
                    rv = jnp.where(arrive, pltpu.roll(rv, t, axis=0), rv)
                    meta = jnp.where(arrive, m_s - s, jnp.where(stay, meta, 0))
                    return rk, rv, meta

                if cond_steps:
                    rk, rv, meta = jax.lax.cond(
                        (need & s) != 0, do_step, lambda a: a, (rk, rv, meta))
                else:
                    rk, rv, meta = do_step((rk, rv, meta))
                s *= 2
            return rk, rv

        zk, zv = colshift(zk, zv, zmeta, up=True)
        ok_, ov_ = colshift(ok_, ov_, ometa, up=False)
        sel = (rows * LANES + lanes) < n0
        return jnp.where(sel, zk, ok_), jnp.where(sel, zv, ov_)
    return split


if "v2" in sys.argv[1:]:
    bench("v2 flagless+cond", make_split_v2(use_mxu=False, cond_steps=True))
if "v2m" in sys.argv[1:]:
    bench("v2m +mxu", make_split_v2(use_mxu=True, cond_steps=True))
if "v2nc" in sys.argv[1:]:
    bench("v2nc flagless only", make_split_v2(use_mxu=False, cond_steps=False))


# ---------------------------------------------------------------- v3: int16
# Sub-word datapath for the split's bookkeeping: the in-row zero cumsum
# (values <= 128), the binary-search probes, and the walk's meta deltas
# (<= R-1 = 1023) all fit int16 — (16,128) tiling halves the vreg count of
# every op touching them. k/v stay u32; Zin/Zex (block-scale values) stay
# i32. Variants isolate which int16 conversions pay.

def make_split_v3(cums16=True, meta16=True):
    I16 = jnp.int16

    def split(k, v, bit):
        R_ = k.shape[0]
        lanes = ps._lanes((R_, LANES))
        rows = ps._rows((R_, LANES))

        if cums16:
            z16 = (1 - bit).astype(I16)
            lanes16 = lanes.astype(I16)
            x = z16
            s = 1
            while s < LANES:
                x = x + jnp.where(lanes >= s, pltpu.roll(x, s, axis=1), jnp.zeros_like(x))
                s *= 2
            cumZ16 = x                                   # (R,128) int16
            c0_16 = cumZ16[:, LANES - 1 : LANES]
            c0 = c0_16.astype(jnp.int32)
        else:
            z = 1 - bit
            cumZ16 = ps._inrow_cumsum(z)
            c0_16 = cumZ16[:, LANES - 1 : LANES]
            c0 = c0_16
        Zin = ps.narrow_cumsum_incl(c0, R_)
        Zex = Zin - c0
        n0 = Zin[R_ - 1, 0]
        Oex = ps._rows((R_, 1)) * LANES - Zex

        is_zero_slot = lanes < c0
        if cums16:
            target16 = jnp.where(is_zero_slot, lanes16 + I16(1),
                                 lanes16 - c0_16 + I16(1))
        lo = jnp.zeros((R_, LANES), jnp.int32)
        step = LANES // 2
        while step >= 1:
            mid = lo + step - 1
            cz = jnp.take_along_axis(cumZ16, mid, axis=1)
            if cums16:
                cm = jnp.where(is_zero_slot, cz, (mid + 1).astype(I16) - cz)
                lo = jnp.where(cm < target16, lo + step, lo)
            else:
                cm = jnp.where(is_zero_slot, cz, mid + 1 - cz)
                target = jnp.where(is_zero_slot, lanes + 1, lanes - c0 + 1)
                lo = jnp.where(cm < target, lo + step, lo)
            step //= 2
        gk = jnp.take_along_axis(k, lo, axis=1)
        gv = jnp.take_along_axis(v, lo, axis=1)

        def route(Fc, base, cnt):
            rank = (lanes - Fc) & (LANES - 1)
            src = jnp.clip(base + rank, 0, LANES - 1)
            rk = jnp.take_along_axis(gk, src, axis=1)
            rv = jnp.take_along_axis(gv, src, axis=1)
            valid = rank < cnt
            q = (Fc >> 7) + jnp.where(lanes < (Fc & (LANES - 1)), 1, 0)
            d = jnp.where(valid, jnp.abs(q - rows), 0)
            if meta16:
                return rk, rv, d.astype(I16)
            return rk, rv, d

        def colshift(rk, rv, meta, up):
            s = 1
            while s < R_:
                t = (R_ - s) % R_ if up else s
                rk_s = pltpu.roll(rk, t, axis=0)
                m_s = pltpu.roll(meta, t, axis=0)
                ss = meta.dtype.type(s)
                arrive = (m_s & ss) != 0
                stay = (meta & ss) == 0
                rk = jnp.where(arrive, rk_s, rk)
                rv = jnp.where(arrive, pltpu.roll(rv, t, axis=0), rv)
                meta = jnp.where(arrive, m_s - ss, jnp.where(stay, meta, jnp.zeros_like(meta)))
                s *= 2
            return rk, rv

        zk, zv, zmeta = route(Zex, jnp.zeros((R_, 1), jnp.int32), c0)
        ok_, ov_, ometa = route(jnp.int32(n0) + Oex, c0, LANES - c0)
        zk, zv = colshift(zk, zv, zmeta, up=True)
        ok_, ov_ = colshift(ok_, ov_, ometa, up=False)
        sel = (rows * LANES + lanes) < n0
        return jnp.where(sel, zk, ok_), jnp.where(sel, zv, ov_)
    return split


if "v3" in sys.argv[1:]:
    bench("v3 int16 cums+meta", make_split_v3(cums16=True, meta16=True))
if "v3c" in sys.argv[1:]:
    bench("v3c int16 cums only", make_split_v3(cums16=True, meta16=False))
if "v3m" in sys.argv[1:]:
    bench("v3m int16 meta only", make_split_v3(cums16=False, meta16=True))


# ---------------------------------------------------------------- v4: packed cums
# Mosaic rejects 16-bit rotates, so sub-word the cumsum MANUALLY: pack the
# 0/1 zero-flags of 4 rows (r, r+R/4, r+R/2, r+3R/4) into one u32's byte
# fields. Row sums <= 128 = 0x80 fit a byte with no cross-field carry, so
# ONE (R/4,128) roll-scan computes all four rows' inclusive cumsums;
# unpack with shifts/ands. Quarter the vreg traffic of the split's
# 50 ps/elem cums phase.

def make_split_v4():
    def split(k, v, bit):
        R_ = k.shape[0]
        Q = R_ // 4
        lanes = ps._lanes((R_, LANES))
        rows = ps._rows((R_, LANES))
        z = 1 - bit

        zq = z.reshape(4, Q, LANES).astype(jnp.uint32)
        packed = (zq[0] | (zq[1] << 8) | (zq[2] << 16) | (zq[3] << 24)).astype(jnp.int32)
        lanesq = ps._lanes((Q, LANES))
        x = packed
        s = 1
        while s < LANES:
            x = x + jnp.where(lanesq >= s, pltpu.roll(x, s, axis=1), 0)
            s *= 2
        xu = x.astype(jnp.uint32)
        cumZ = jnp.concatenate(
            [xu & 0xFF, (xu >> 8) & 0xFF, (xu >> 16) & 0xFF, (xu >> 24) & 0xFF], axis=0
        ).reshape(R_, LANES).astype(jnp.int32)

        c0 = cumZ[:, LANES - 1 : LANES]
        Zin = ps.narrow_cumsum_incl(c0, R_)
        Zex = Zin - c0
        n0 = Zin[R_ - 1, 0]
        Oex = ps._rows((R_, 1)) * LANES - Zex

        is_zero_slot = lanes < c0
        target = jnp.where(is_zero_slot, lanes + 1, lanes - c0 + 1)
        lo = jnp.zeros((R_, LANES), jnp.int32)
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
            rank = (lanes - Fc) & (LANES - 1)
            src = jnp.clip(base + rank, 0, LANES - 1)
            rk = jnp.take_along_axis(gk, src, axis=1)
            rv = jnp.take_along_axis(gv, src, axis=1)
            valid = rank < cnt
            q = (Fc >> 7) + jnp.where(lanes < (Fc & (LANES - 1)), 1, 0)
            meta = jnp.where(valid, jnp.abs(q - rows), 0)
            return rk, rv, meta

        def colshift(rk, rv, meta, up):
            s = 1
            while s < R_:
                t = (R_ - s) % R_ if up else s
                rk_s = pltpu.roll(rk, t, axis=0)
                m_s = pltpu.roll(meta, t, axis=0)
                arrive = (m_s & s) != 0
                stay = (meta & s) == 0
                rk = jnp.where(arrive, rk_s, rk)
                rv = jnp.where(arrive, pltpu.roll(rv, t, axis=0), rv)
                meta = jnp.where(arrive, m_s - s, jnp.where(stay, meta, 0))
                s *= 2
            return rk, rv

        zk, zv, zmeta = route(Zex, jnp.zeros((R_, 1), jnp.int32), c0)
        ok_, ov_, ometa = route(jnp.int32(n0) + Oex, c0, LANES - c0)
        zk, zv = colshift(zk, zv, zmeta, up=True)
        ok_, ov_ = colshift(ok_, ov_, ometa, up=False)
        sel = (rows * LANES + lanes) < n0
        return jnp.where(sel, zk, ok_), jnp.where(sel, zv, ov_)
    return split


if "v4" in sys.argv[1:]:
    bench("v4 packed4 cums", make_split_v4())
