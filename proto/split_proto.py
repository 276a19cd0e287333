"""Prototype: stable 1-bit split of a (R,128) key/value tile, fully in VMEM.

Row-major element order. Phases:
  1. in-row counts: per-row inclusive zero-count (log-shift lane scan);
  2. route: per class (zeros/ones), for every (row, dest-lane) find the
     in-row source lane by binary search over the monotone count vector
     (lane gathers), so each element lands in its FINAL lane with a
     dest-row tag;
  3. cross-row: masked sublane log-shift per class (zeros move up, ones
     move down) — collision-free because per-lane dest rows are strictly
     monotone; merge by the n0 boundary.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)


def _inrow_cumsum(x):
    lanes = _lane_iota(x.shape)
    s = 1
    while s < L:
        x = x + jnp.where(lanes >= s, pltpu.roll(x, s, axis=x.ndim - 1), 0)
        s *= 2
    return x


def _col_cumsum_incl(x, R):
    rows = _row_iota(x.shape)
    s = 1
    while s < R:
        x = x + jnp.where(rows >= s, pltpu.roll(x, s, axis=x.ndim - 2), 0)
        s *= 2
    return x


def split_bit(k, v, bit):
    """k, v: (R, L) uint32; bit: (R, L) int32 in {0,1}. Returns (k', v')
    stably split in row-major order (bit=0 elements first)."""
    R = k.shape[0]
    lanes = _lane_iota((R, L))
    rows = _row_iota((R, L))
    z = 1 - bit
    cumZ = _inrow_cumsum(z)              # (R,L) inclusive zeros
    c0 = cumZ[:, L - 1 : L]              # (R,1)
    c1 = L - c0
    Zin = _col_cumsum_incl(c0, R)        # inclusive zeros by row
    Zex = Zin - c0
    n0 = Zin[R - 1, 0]                   # scalar: total zeros
    Oex = _row_iota((R, 1)) * L - Zex    # exclusive ones before row

    def route(Fc, cnt, want_zero):
        """For each (row, lane l): fetch the class element of this row whose
        dest flat position is ≡ l (mod 128). Returns rotated k, v, dest row,
        valid mask."""
        rank_needed = (lanes - Fc) % L                 # occurrence index
        target = rank_needed + 1
        # binary search: smallest lane with cum_class >= target
        lo = jnp.zeros((R, L), jnp.int32)
        step = 64
        while step >= 1:
            mid = lo + step - 1
            cz = jnp.take_along_axis(cumZ, mid, axis=1)
            cm = jnp.where(want_zero, cz, mid + 1 - cz)
            lo = jnp.where(cm < target, lo + step, lo)
            step //= 2
        rk = jnp.take_along_axis(k, lo, axis=1)
        rv = jnp.take_along_axis(v, lo, axis=1)
        valid = rank_needed < cnt
        q = (Fc // L) + jnp.where(lanes < (Fc % L), 1, 0)
        return rk, rv, q, valid

    def colshift(rk, rv, q, valid, up):
        d = jnp.where(valid, jnp.where(up, rows - q, q - rows), 0)
        lv = valid.astype(jnp.int32)
        s = 1
        while s < R:
            t = (R - s) % R if up else s   # roll(x,t,0): row r -> row r+t (mod R)
            rk_s = pltpu.roll(rk, t, axis=0)
            rv_s = pltpu.roll(rv, t, axis=0)
            d_s = pltpu.roll(d, t, axis=0)
            lv_s = pltpu.roll(lv, t, axis=0)
            arrive = jnp.logical_and(lv_s == 1, ((d_s // s) % 2) == 1)
            stay = jnp.logical_and(lv == 1, ((d // s) % 2) == 0)
            rk = jnp.where(arrive, rk_s, rk)
            rv = jnp.where(arrive, rv_s, rv)
            d = jnp.where(arrive, d_s - s, d)
            lv = jnp.where(arrive, jnp.int32(1), jnp.where(stay, lv, 0))
            s *= 2
        return rk, rv

    zk, zv, zq, zval = route(Zex, c0, True)
    ok_, ov_, oq, oval = route(jnp.int32(n0) + Oex, c1, False)
    zk, zv = colshift(zk, zv, zq, zval, up=True)
    ok_, ov_ = colshift(ok_, ov_, oq, oval, up=False)
    flat = rows * L + lanes
    out_k = jnp.where(flat < n0, zk, ok_)
    out_v = jnp.where(flat < n0, zv, ov_)
    return out_k, out_v


def make_split_call(R, nbits=1, interpret=False):
    def kernel(k_ref, v_ref, ok_ref, ov_ref):
        k, v = k_ref[:], v_ref[:]
        for b in range(nbits):
            bit = ((k >> jnp.uint32(b)) & jnp.uint32(1)).astype(jnp.int32)
            k, v = split_bit(k, v, bit)
        ok_ref[:] = k
        ov_ref[:] = v

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((R, L), jnp.uint32)] * 2,
        interpret=interpret,
    )


if __name__ == "__main__":
    R = 256
    rng = np.random.default_rng(0)
    for pattern in ["random", "zeros", "ones", "alternating", "firsthalf", "lasthalf"]:
        if pattern == "random":
            hk = rng.integers(0, 1 << 32, (R, L), dtype=np.uint32)
        elif pattern == "zeros":
            hk = np.zeros((R, L), np.uint32)
        elif pattern == "ones":
            hk = np.ones((R, L), np.uint32)
        elif pattern == "alternating":
            hk = (np.arange(R * L, dtype=np.uint32).reshape(R, L)) & 1
        elif pattern == "firsthalf":
            hk = (np.arange(R * L).reshape(R, L) >= R * L // 2).astype(np.uint32)
        else:
            hk = (np.arange(R * L).reshape(R, L) < R * L // 2).astype(np.uint32)
        hv = np.arange(R * L, dtype=np.uint32).reshape(R, L)
        f = jax.jit(make_split_call(R))
        okk, ovv = f(jnp.asarray(hk), jnp.asarray(hv))
        okk, ovv = np.asarray(okk).reshape(-1), np.asarray(ovv).reshape(-1)
        fk = hk.reshape(-1)
        b = fk & 1
        order = np.argsort(b, kind="stable")
        good = (okk == fk[order]).all() and (ovv == hv.reshape(-1)[order]).all()
        print(f"{pattern}: {'OK' if good else 'WRONG'}")
        if not good:
            bad = np.nonzero(ovv != hv.reshape(-1)[order])[0][:5]
            print("  first bad at:", bad[:5], "got", ovv[bad[:5]], "want", hv.reshape(-1)[order][bad[:5]])
