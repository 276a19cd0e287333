"""Perf lab: re-price direct 16-way rank computation with the MXU byte-plane
prefix (VERDICT r2 item 1), in the SPLIT's geometry this time.

Round-1 NOTES priced "16-way MXU ranks" at ~136 ps/elem and called it a dead
end — but that number was measured before the scan kernel proved the MXU
in-row prefix runs at ~31 ps/elem for 4 byte planes when the tile is already
(R, 128) (proto/scan_mxu_lab.py, commit 46d4920). This lab measures, at the
sort's production geometry (R=1024 blocks, chained timing on the real chip):

  A. group4:   the shipped 4x 1-bit-split grouping of a (R,128) kv block
               (the ~780 ps/pass baseline; NOTES "The split's architectural
               floor" breaks it down as 4 x [cums 18 + search 28 + route 27
               + walk 70 + glue 50]).
  B. rank16:   full 16-way stable in-block destination for every element,
               computed directly: 16 digit one-hot bf16 planes -> 16
               triangular matmuls (in-row per-digit inclusive prefix; exact,
               counts <= 128), own-plane selection, per-digit cross-row
               offsets (one (R,128) column log-scan over lanes 0..15), digit
               bases, and the final dest = base + rowoff + inrow - 1 via one
               lane gather. This is the RANK half of a hypothetical direct
               radix-16 pass; movement is priced separately.
  C. walk1:    ONE class walk (log2(R) masked sublane roll rounds over one
               key array + meta) — the unit from which any k-class movement
               scheme's cost assembles: the shipped 1-bit split pays 2 class
               walks per split (8 per pass); ranked 16-way movement needs 16
               (one per digit class: within a (lane, class) the dest rows are
               monotone ONLY per class, so classes cannot share a walk).

  Movement alternatives priced by arithmetic from these measurements (no
  kernel can make them cheap):
  - 16 class walks: 16 x walk1 vs the shipped 8 x walk1 per pass — strictly
    worse, independent of the rank cost.
  - run-structured row emission (DMA the (row, digit) runs): avg run length
    is 128/16 = 8 elements; the splicer's minimum read is _READ_ROWS x 128
    elements per run -> ~1000x read amplification. Refuted by arithmetic.

Usage (real TPU): python proto/rank16_lab.py [R] [blocks]
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
from glu_tpu.ops._pallas_common import LANES

R = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
BLOCKS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
N = R * LANES * BLOCKS


def fence(x):
    np.asarray(jax.tree.leaves(x)[0][:1])


def chain_time(fn, args, iters=8):
    def chained(it):
        @jax.jit
        def g(state):
            return jax.lax.fori_loop(0, it, lambda i, s: fn(*s) if isinstance(s, tuple) else fn(s), state)
        return g

    g1, gn = chained(1), chained(1 + iters)
    fence(g1(args)); fence(gn(args))

    def t(g):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); fence(g(args)); best = min(best, time.perf_counter() - t0)
        return best

    return (t(gn) - t(g1)) / iters


def _lanes(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _rows(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)


def _tri_u_bf16():
    r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return jnp.clip(c - r + 1, 0, 1).astype(jnp.bfloat16)


# ---------------------------------------------------------------- A. group4
def group4_kernel(k_ref, v_ref, ok_ref, ov_ref):
    k, vs = ps._group_block(k_ref[:], [v_ref[:]], jnp.arange(4, dtype=jnp.int32), 4)
    ok_ref[:] = k
    ov_ref[:] = vs[0]


# --------------------------------------------------------------- B. rank16
def rank16_kernel(k_ref, dest_ref):
    """Full 16-way stable in-block dest, all phases on-chip."""
    k = k_ref[:]
    digit = (k & jnp.uint32(15)).astype(jnp.int32)
    u = _tri_u_bf16()
    dn = (((1,), (0,)), ((), ()))
    # 16 one-hot planes -> in-row inclusive per-digit prefixes via MXU
    inrow_own = jnp.zeros((R, LANES), jnp.int32)     # own-digit in-row rank (incl)
    rowtot = jnp.zeros((R, LANES), jnp.int32)        # lane d < 16: row total of digit d
    lanes = _lanes((R, LANES))
    for d in range(16):
        oh = (digit == d).astype(jnp.bfloat16)
        pre = jax.lax.dot_general(oh, u, dn, preferred_element_type=jnp.float32).astype(jnp.int32)
        inrow_own = jnp.where(digit == d, pre, inrow_own)
        last = jax.lax.broadcast_in_dim(pre[:, LANES - 1 : LANES], (R, LANES), (0, 1))
        rowtot = jnp.where(lanes == d, last, rowtot)
    # cross-row exclusive offsets per digit: one column log-scan of the
    # (R, 128) row-total tile (lanes 16..127 are zero ballast)
    rows = _rows((R, LANES))
    inc = rowtot
    s = 1
    while s < R:
        inc = inc + jnp.where(rows >= s, pltpu.roll(inc, s, axis=0), 0)
        s *= 2
    rowoff = inc - rowtot                            # exclusive over rows
    # digit bases: block totals live in row R-1 of inc; in-row exclusive cumsum
    tot = jax.lax.broadcast_in_dim(inc[R - 1 : R, :], (R, LANES), (0, 1))
    base_inc = tot
    s = 1
    while s < LANES:
        base_inc = base_inc + jnp.where(lanes >= s, pltpu.roll(base_inc, s, axis=1), 0)
        s *= 2
    base = base_inc - tot                            # exclusive digit base, lane d
    # dest = base[digit] + rowoff[r, digit] + inrow_own - 1 (one lane gather)
    bo = jnp.take_along_axis(base + rowoff, digit, axis=1)
    dest_ref[:] = pltpu.bitcast(bo + inrow_own - 1, jnp.uint32)


# ------------------------------------------------- D. group4 with MXU cums
def _split_round_mxucums(k, vs, bit):
    """The shipped _split_round with _packed4_inrow_cumsum replaced by ONE
    bf16 triangular matmul (cumZ of a 0/1 row is <= 128: exact in bf16 ->
    f32 -> i32). Rank16's measurement prices 16 such matmuls + glue at
    ~50 ps/elem, so one should cost ~3-5 ps vs the packed roll-scan's 18."""
    R_ = k.shape[0]
    lanes = _lanes((R_, LANES))
    rows = _rows((R_, LANES))
    z = 1 - bit
    u = _tri_u_bf16()
    dn = (((1,), (0,)), ((), ()))
    cumZ = jax.lax.dot_general(
        z.astype(jnp.bfloat16), u, dn, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    from glu_tpu.ops._pallas_common import narrow_cumsum_incl
    c0 = cumZ[:, LANES - 1 : LANES]
    Zin = narrow_cumsum_incl(c0, R_)
    Zex = Zin - c0
    n0 = Zin[R_ - 1, 0]
    Oex = _rows((R_, 1)) * LANES - Zex

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
    gvs = [jnp.take_along_axis(v, lo, axis=1) for v in vs]

    def route(Fc, base, cnt):
        rank = (lanes - Fc) & (LANES - 1)
        src = jnp.clip(base + rank, 0, LANES - 1)
        rk = jnp.take_along_axis(gk, src, axis=1)
        rvs = [jnp.take_along_axis(gv, src, axis=1) for gv in gvs]
        valid = rank < cnt
        q = (Fc >> 7) + jnp.where(lanes < (Fc & (LANES - 1)), 1, 0)
        meta = jnp.where(valid, jnp.abs(q - rows), 0)
        return rk, rvs, meta

    def colshift(rk, rvs, meta, up):
        s = 1
        while s < R_:
            t = (R_ - s) % R_ if up else s
            rk_s = pltpu.roll(rk, t, axis=0)
            m_s = pltpu.roll(meta, t, axis=0)
            arrive = (m_s & s) != 0
            stay = (meta & s) == 0
            rk = jnp.where(arrive, rk_s, rk)
            rvs = [jnp.where(arrive, pltpu.roll(rv, t, axis=0), rv) for rv in rvs]
            meta = jnp.where(arrive, m_s - s, jnp.where(stay, meta, 0))
            s *= 2
        return rk, rvs

    zk, zvs, zmeta = route(Zex, jnp.zeros((R_, 1), jnp.int32), c0)
    ok_, ovs_, ometa = route(jnp.int32(n0) + Oex, c0, LANES - c0)
    zk, zvs = colshift(zk, zvs, zmeta, up=True)
    ok_, ovs_ = colshift(ok_, ovs_, ometa, up=False)
    sel = (rows * LANES + lanes) < n0
    out_k = jnp.where(sel, zk, ok_)
    out_vs = [jnp.where(sel, a, b) for a, b in zip(zvs, ovs_)]
    return out_k, out_vs


def group4_mxu_kernel(k_ref, v_ref, ok_ref, ov_ref):
    k, vs = k_ref[:], [v_ref[:]]
    for b in range(4):
        bit = ((k >> jnp.uint32(b)) & jnp.uint32(1)).astype(jnp.int32)
        k, vs = _split_round_mxucums(k, vs, bit)
    ok_ref[:] = k
    ov_ref[:] = vs[0]


# --------------------------------------- E. group4 with WIDE Zin column scan
def _col_prefix_wide(totals, R_):
    wide = jax.lax.broadcast_in_dim(totals, (R_, LANES), (0, 1))
    rows = jax.lax.broadcasted_iota(jnp.int32, wide.shape, 0)
    s = 1
    while s < R_:
        wide = wide + jnp.where(rows >= s, pltpu.roll(wide, s, axis=0), 0)
        s *= 2
    return wide[:, 0:1]


def group4_widezin_kernel(k_ref, v_ref, ok_ref, ov_ref):
    """Shipped split but Zin = lane-replicated wide column scan instead of
    narrow_cumsum_incl — the scan kernel's colwide discovery applied to the
    sort's per-split (R,1) zero-count scan."""
    import glu_tpu.ops._pallas_common as pc

    orig = pc.narrow_cumsum_incl
    try:
        pc_narrow = lambda col, rows_n: _col_prefix_wide(col, rows_n)
        ps.narrow_cumsum_incl = pc_narrow
        k, vs = ps._group_block(k_ref[:], [v_ref[:]], jnp.arange(4, dtype=jnp.int32), 4)
    finally:
        ps.narrow_cumsum_incl = orig
    ok_ref[:] = k
    ov_ref[:] = vs[0]


# ---------------------------------------------------------------- C. walk1
def walk1_kernel(k_ref, m_ref, ok_ref):
    k = k_ref[:]
    meta = (m_ref[:] & jnp.uint32(R - 1)).astype(jnp.int32)  # bounded deltas
    s = 1
    while s < R:
        t = s
        k_s = pltpu.roll(k, t, axis=0)
        m_s = pltpu.roll(meta, t, axis=0)
        arrive = (m_s & s) != 0
        stay = (meta & s) == 0
        k = jnp.where(arrive, k_s, k)
        meta = jnp.where(arrive, m_s - s, jnp.where(stay, meta, 0))
        s *= 2
    ok_ref[:] = k


def run_pallas(kernel, n_in, n_out, x_list):
    spec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = [jax.ShapeDtypeStruct((BLOCKS * R, LANES), jnp.uint32)] * n_out
    if n_out == 1:
        shape = shape[0]
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def fn(*arrs):
        return pl.pallas_call(
            kernel, grid=(BLOCKS,),
            in_specs=[spec] * n_in, out_specs=[spec] * n_out if n_out > 1 else spec,
            out_shape=shape, compiler_params=params,
        )(*arrs)

    return fn


def rank16_dest_oracle(k2):
    """numpy oracle for the 16-way dest of each block."""
    out = np.zeros_like(k2, dtype=np.int64)
    for b in range(k2.shape[0] // R):
        blk = k2[b * R : (b + 1) * R].reshape(-1)
        digit = blk & 15
        order = np.argsort(digit, kind="stable")
        inv = np.empty_like(order)
        inv[order] = np.arange(order.size)
        out[b * R : (b + 1) * R] = inv.reshape(R, LANES)
    return out


def main():
    print(f"device={jax.devices()[0].device_kind} R={R} blocks={BLOCKS} n={N}")
    key = jax.random.key(0)
    k2 = jax.random.bits(key, (BLOCKS * R, LANES), dtype=jnp.uint32)
    v2 = jax.random.bits(jax.random.key(1), (BLOCKS * R, LANES), dtype=jnp.uint32)
    m2 = jax.random.bits(jax.random.key(2), (BLOCKS * R, LANES), dtype=jnp.uint32)

    # correctness of rank16 (small check against numpy oracle)
    f_rank = run_pallas(
        lambda kr, dr: rank16_kernel(kr, dr), 1, 1, None
    )
    small = np.asarray(k2[: 2 * R])  # 2 blocks worth

    def rank_small(x):
        spec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            rank16_kernel, grid=(2,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((2 * R, LANES), jnp.uint32),
        )(x)

    got = np.asarray(jax.jit(rank_small)(jnp.asarray(small))).astype(np.int64)
    want = rank16_dest_oracle(small)
    ok = (got == want).all()
    print(f"rank16 correctness vs oracle: {'OK' if ok else 'MISMATCH'}")
    if not ok:
        bad = np.argwhere(got != want)[:5]
        print("first mismatches:", bad, got[tuple(bad[0])], want[tuple(bad[0])])

    # timings
    f_group4 = run_pallas(group4_kernel, 2, 2, None)
    t = chain_time(lambda a, b: tuple(f_group4(a, b)), (k2, v2), iters=8)
    print(f"A group4 (4x 1-bit kv split):  {t/N*1e12:8.1f} ps/elem   ({t*1e3:.2f} ms)")

    t = chain_time(lambda a: (f_rank(a), )[0], k2, iters=8)
    print(f"B rank16 (MXU 16-way dest):    {t/N*1e12:8.1f} ps/elem   ({t*1e3:.2f} ms)")

    f_walk = run_pallas(walk1_kernel, 2, 1, None)
    t = chain_time(lambda a, b: (f_walk(a, b), b), (k2, m2), iters=8)
    print(f"C walk1 (one class walk):      {t/N*1e12:8.1f} ps/elem   ({t*1e3:.2f} ms)")

    # D: correctness vs group4, then timing
    f_group4mxu = run_pallas(group4_mxu_kernel, 2, 2, None)

    def small2(kernel):
        spec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        shape = [jax.ShapeDtypeStruct((2 * R, LANES), jnp.uint32)] * 2
        return jax.jit(lambda a, b: tuple(pl.pallas_call(
            kernel, grid=(2,), in_specs=[spec, spec], out_specs=[spec, spec],
            out_shape=shape,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(a, b)))

    ka, va = k2[: 2 * R], v2[: 2 * R]
    r0 = small2(group4_kernel)(ka, va)
    r1 = small2(group4_mxu_kernel)(ka, va)
    same = all((np.asarray(x) == np.asarray(y)).all() for x, y in zip(r0, r1))
    print(f"D group4-mxucums correctness vs shipped: {'OK' if same else 'MISMATCH'}")
    t = chain_time(lambda a, b: tuple(f_group4mxu(a, b)), (k2, v2), iters=8)
    print(f"D group4 w/ MXU cumZ:          {t/N*1e12:8.1f} ps/elem   ({t*1e3:.2f} ms)")

    # E: wide Zin column scan
    f_gw = run_pallas(group4_widezin_kernel, 2, 2, None)
    rw = small2(group4_widezin_kernel)(ka, va)
    same = all((np.asarray(x) == np.asarray(y)).all() for x, y in zip(r0, rw))
    print(f"E group4-widezin correctness vs shipped: {'OK' if same else 'MISMATCH'}")
    t = chain_time(lambda a, b: tuple(f_gw(a, b)), (k2, v2), iters=8)
    print(f"E group4 w/ wide Zin scan:     {t/N*1e12:8.1f} ps/elem   ({t*1e3:.2f} ms)")
    print()
    print("movement arithmetic: shipped pass = 8 x walk1 (+4x route/search);")
    print("ranked 16-way pass = 16 x walk1 + rank16; run-emission DMA = ")
    print(f"  avg run 8 elems, min read {ps._READ_ROWS}x128 elems -> ~{ps._READ_ROWS*128//8}x read amplification")


if __name__ == "__main__":
    main()
