"""Primitive legality + cost lab: the ops the next-gen group kernel needs.

Each experiment is a tiny pallas kernel run on the real TPU, correctness
checked against numpy, then chain-timed.

  gatherx  — cross-tile lane gather: take_along_axis(axis=1) on (128,1024)
             with full-range [0,1024) indices
  rollx    — cross-tile lane roll: pltpu.roll(axis=1) by >128 on (128,1024)
  tpose    — in-kernel (128,128) panel transposes of a (1024,128) block
  tpose_w  — whole-array (1024,128) -> (128,1024) transpose
  bgather  — per-row broadcast gather: row (1,128) broadcast to (1024,128)
             then take_along_axis
  flatg    — full block-local flat gather: out[j] = x[idx[j]] for a
             (1024,128) block via 8 panel transposes + gathers + selects
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


def run_one(name, make_kernel, in_shapes, oracle, grid_blocks=NB, block_shape=(R, LANES)):
    """in_shapes: list of (shape-per-block, dtype). Arrays are tiled per
    block along axis 0. oracle(*host_blocks) -> expected block output."""
    specs = [
        pl.BlockSpec((s[0], s[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for s, _ in in_shapes
    ]
    out_spec = pl.BlockSpec(block_shape, lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((grid_blocks * block_shape[0], block_shape[1]), jnp.uint32)

    def fn(*arrs):
        return pl.pallas_call(
            make_kernel, grid=(grid_blocks,), in_specs=specs, out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        )(*arrs)

    rng = np.random.default_rng(0)
    host = []
    for (s, dt) in in_shapes:
        full = (grid_blocks * s[0], s[1])
        if dt == np.uint32:
            host.append(rng.integers(0, 1 << 32, full, dtype=np.uint32))
        else:
            host.append(rng.integers(0, s[1] * s[0], full, dtype=np.int32))
    dev = [jnp.asarray(h) for h in host]
    try:
        out = np.asarray(fn(*dev))
    except Exception as e:
        print(f"{name:10s}: FAIL compile/run: {type(e).__name__}: {str(e)[:300]}", flush=True)
        return
    exp = oracle(*[h[: in_shapes[0][0][0]] if False else h for h in host])
    ok = (out[: exp.shape[0]] == exp).all() if exp is not None else True
    t = chain_time(fn, tuple(dev))
    nelem = grid_blocks * block_shape[0] * block_shape[1]
    print(f"{name:10s}: correct={ok} {t*1e3:7.3f} ms  {t/nelem*1e12:6.2f} ps/elem", flush=True)


def main():
    want = sys.argv[1:] or ["gatherx", "rollx", "tpose", "tpose_w", "bgather", "flatg"]

    if "gatherx" in want:
        # block (128,1024): gather along 1024 lanes, idx = reversed lanes
        def kern(x_ref, o_ref):
            x = x_ref[:]
            idx = (1023 - jax.lax.broadcasted_iota(jnp.int32, (128, 1024), 1))
            o_ref[:] = jnp.take_along_axis(x, idx, axis=1)

        def oracle(x):
            out = np.empty_like(x)
            for b in range(x.shape[0] // 128):
                blk = x[b * 128:(b + 1) * 128]
                out[b * 128:(b + 1) * 128] = blk[:, ::-1]
            return out

        run_one("gatherx", kern, [((128, 1024), np.uint32)], oracle,
                grid_blocks=NB * 8 // 8, block_shape=(128, 1024))

    if "rollx" in want:
        def kern(x_ref, o_ref):
            o_ref[:] = pltpu.roll(x_ref[:], 300, axis=1)

        def oracle(x):
            out = np.empty_like(x)
            for b in range(x.shape[0] // 128):
                blk = x[b * 128:(b + 1) * 128]
                out[b * 128:(b + 1) * 128] = np.roll(blk, 300, axis=1)
            return out

        run_one("rollx", kern, [((128, 1024), np.uint32)], oracle,
                grid_blocks=NB, block_shape=(128, 1024))

    if "tpose" in want:
        # 8 x (128,128) panel transposes of a (1024,128) block
        def kern(x_ref, o_ref):
            x = x_ref[:]
            parts = []
            for p in range(8):
                parts.append(x[p * 128:(p + 1) * 128, :].T)
            o_ref[:] = jnp.concatenate(parts, axis=0)

        def oracle(x):
            out = np.empty_like(x)
            for b in range(x.shape[0] // 1024):
                blk = x[b * 1024:(b + 1) * 1024]
                for p in range(8):
                    out[b * 1024 + p * 128: b * 1024 + (p + 1) * 128] = blk[p * 128:(p + 1) * 128].T
            return out

        run_one("tpose", kern, [((1024, 128), np.uint32)], oracle)

    if "tpose_w" in want:
        def kern(x_ref, o_ref):
            o_ref[:] = x_ref[:].reshape(8, 128, 128).transpose(0, 2, 1).reshape(1024, 128)

        run_one("tpose_w", kern, [((1024, 128), np.uint32)], lambda x: None)

    if "bgather" in want:
        # broadcast row 0 of block, gather by (reversed) per-slot indices
        def kern(x_ref, o_ref):
            x = x_ref[:]
            row = jnp.broadcast_to(x[0:1, :], (1024, 128))
            idx = (127 - jax.lax.broadcasted_iota(jnp.int32, (1024, 128), 1))
            o_ref[:] = jnp.take_along_axis(row, idx, axis=1)

        def oracle(x):
            out = np.empty_like(x)
            for b in range(x.shape[0] // 1024):
                blk = x[b * 1024:(b + 1) * 1024]
                out[b * 1024:(b + 1) * 1024] = np.broadcast_to(blk[0:1, ::-1], (1024, 128))
            return out

        run_one("bgather", kern, [((1024, 128), np.uint32)], oracle)

    if "flatg" in want:
        # full flat gather out.flat[j] = x.flat[idx.flat[j]] within a block:
        # via 8 panel transposes of x, per-dst-panel cross-panel gathers.
        # x viewed panels: xT[p][l, r] = x[128p + r, l].
        # dst slot (r,l): src flat s = idx[r,l]; sr = s >> 7, sl = s & 127.
        # For dst panel pd: transpose idx panel -> idxT[l, r']; for each src
        # panel q: g_q[l, r'] = xT[q][l, (srT - 128 q) clipped...] select by
        # panel match; then transpose result back.
        def kern(x_ref, i_ref, o_ref):
            x = x_ref[:]
            idx = i_ref[:]
            xT = [x[q * 128:(q + 1) * 128, :].T for q in range(8)]   # [l, r]
            outs = []
            for pd in range(8):
                idxT = idx[pd * 128:(pd + 1) * 128, :].T             # [l, r']
                sr = idxT >> 7
                sl = idxT & 127
                # gather: for each src panel q: need xT[q][l, sr - wait,
                # value = x[sr*128? no: x[sr_row, sl] = xT[sr>>7][sl, sr&127]
                # we have idxT[l, r'] = flat src = 128*srow + slane
                srow = idxT >> 7          # [l, r'] source row 0..1023
                slane = idxT & 127
                acc = jnp.zeros((128, 128), jnp.uint32)
                for q in range(8):
                    rloc = jnp.clip(srow - q * 128, 0, 127)
                    # need xT[q][slane, rloc]: gather along axis=1 of xT[q]
                    # with OUTPUT row l... but value's row index is slane
                    # (varies per slot) -> need double gather:
                    # step 1: gq[l, r'] = xT[q][l, rloc[l, r']]   (row l fixed)
                    # gives x[128q + rloc, l] -- the element in OUR lane l at
                    # the source row. That's only correct if slane == l.
                    gq = jnp.take_along_axis(xT[q], rloc, axis=1)
                    acc = jnp.where((srow >= q * 128) & (srow < (q + 1) * 128) & (slane == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)), gq, acc)
                outs.append(acc.T)
            o_ref[:] = jnp.concatenate(outs, axis=0)

        # NOTE: this only realizes gathers where src lane == dst lane
        # (column-preserving). The group kernel's flat gather has exactly
        # this property IF the in-row phase already routed to final lanes.
        def oracle(x_and_idx_unused):
            return None

        def mkidx(rng):
            # column-preserving random permutation: per lane, a random row perm
            perm = np.empty((NB * R, LANES), np.int32)
            for b in range(NB):
                for l in range(LANES):
                    p = rng.permutation(R)
                    perm[b * R:(b + 1) * R, l] = (b * 0 + p) * 128 + l
            return perm

        rng = np.random.default_rng(0)
        xh = rng.integers(0, 1 << 32, (NB * R, LANES), dtype=np.uint32)
        ih = mkidx(rng)
        exp = np.empty_like(xh)
        for b in range(NB):
            blk = xh[b * R:(b + 1) * R]
            ib = ih[b * R:(b + 1) * R]
            exp[b * R:(b + 1) * R] = blk.reshape(-1, LANES * 0 + LANES)[ib >> 7, ib & 127]

        spec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ispec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((NB * R, LANES), jnp.uint32)

        def fn(xa, ia):
            return pl.pallas_call(
                kern, grid=(NB,), in_specs=[spec, ispec], out_specs=spec, out_shape=shape,
                compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
            )(xa, ia)

        try:
            out = np.asarray(fn(jnp.asarray(xh), jnp.asarray(ih.astype(np.int32))))
            ok = (out == exp).all()
        except Exception as e:
            print(f"flatg     : FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
            return
        t = chain_time(fn, (jnp.asarray(xh), jnp.asarray(ih.astype(np.int32))))
        print(f"flatg     : correct={ok} {t*1e3:7.3f} ms  {t/N*1e12:6.2f} ps/elem", flush=True)


if __name__ == "__main__":
    main()
