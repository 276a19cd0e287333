"""Reduce kernel variants lab (round 5, VERDICT #2).

VS_XLA_r04 shows the shipped pallas reduce LOSES to jnp.sum at every
HBM-resident size (67M: 218 vs 289 GB/s; 268M: 190 vs 258). Both are far
below the v5e's ~819 GB/s HBM read roofline, so the right question is not
"route or kernel" but "where is the read bandwidth going". Variants:

  - ship:   the shipped kernel (block_rows=2048, last dim 128)
  - rows R: same kernel at other block heights
  - wide W: blocks with last dim W > 128 (fewer, fatter DMAs)
  - noop:   same DMA schedule, fold replaced by one-row touch — the pure
            DMA floor for this grid (if ship == noop the kernel is
            DMA-bound and only the DMA shape can help)
  - 2acc:   two independent (8,128) accumulators combined at the end
            (breaks the serial combine dependency across grid steps)
  - jnp:    jnp.sum baseline

Chained timing through the tunnel (fence = 1-element fetch; the axon
block_until_ready lie is documented in .claude/skills/verify).

Usage: python proto/reduce_lab2.py [log2_n]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8


def fence(x):
    np.asarray(jax.tree.leaves(x)[0])


def chain_time(fn, arrays):
    """Differenced multi-array timing: sum fn over K distinct arrays in one
    jit (no loop-invariant hoisting possible, each array read fresh from
    HBM), minus the 1-array run, over K-1. A reduction consumes its array;
    chaining by re-feeding one array would either get hoisted (constant
    input) or add a full elementwise pass (mutated input)."""
    def group(k):
        @jax.jit
        def g(*xs):
            tot = jnp.uint32(0)
            for x in xs[:k]:
                tot = tot + fn(x)
            return tot
        return g
    g1, gn = group(1), group(len(arrays))
    fence(g1(*arrays)); fence(gn(*arrays))
    def t(g):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); fence(g(*arrays)); best = min(best, time.perf_counter() - t0)
        return best
    return (t(gn) - t(g1)) / (len(arrays) - 1)


def make_kernel(block_rows, width, nacc=1, noop=False):
    def kernel(x_ref, o_ref, *accs):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for a in accs:
                a[:] = jnp.zeros((SUBLANES, width), jnp.int32)

        tile = pltpu.bitcast(x_ref[:], jnp.int32)
        if noop:
            accs[0][:] = accs[0][:] + tile[:SUBLANES]
        else:
            g = block_rows // (SUBLANES * nacc)
            t3 = tile.reshape(nacc, g, SUBLANES, width)
            for a_i, a in enumerate(accs):
                a[:] = a[:] + jnp.sum(t3[a_i], axis=0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            total = accs[0][:]
            for a in accs[1:]:
                total = total + a[:]
            o_ref[0, 0] = jnp.sum(total)

    return kernel


def variant(n, block_rows, width, nacc=1, noop=False):
    rows = n // width
    nblocks = rows // block_rows
    assert rows % block_rows == 0

    def fn(x):
        x2 = x.reshape(rows, width)
        out = pl.pallas_call(
            make_kernel(block_rows, width, nacc, noop),
            grid=(nblocks,),
            in_specs=[pl.BlockSpec((block_rows, width), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[pltpu.VMEM((SUBLANES, width), jnp.int32)] * nacc,
        )(x2)
        return jax.lax.bitcast_convert_type(out[0, 0], jnp.uint32)
    return fn


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    n = 1 << lg
    K = 13 if lg >= 28 else 25  # keep total under ~14 GB HBM
    rng = np.random.default_rng(0)
    base = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    arrays = [jnp.asarray(base if i == 0 else np.roll(base, i)) for i in range(K)]
    want = None

    def report(name, fn):
        nonlocal want
        got = int(np.asarray(jax.jit(fn)(arrays[0])))
        if want is None:
            want = got
        ok = "ok" if got == want else "WRONG"
        t = chain_time(fn, arrays)
        print(f"{name:20s}: {t*1e3:7.3f} ms  {n*4/t/1e9:6.1f} GB/s read  [{ok}]",
              flush=True)

    report("jnp.sum", lambda x: jnp.sum(x, dtype=jnp.uint32))
    report("ship rows2048", variant(n, 2048, 128))
    report("rows4096", variant(n, 4096, 128))
    report("rows8192", variant(n, 8192, 128))
    report("wide512 r512", variant(n, 512, 512))
    report("wide512 r1024", variant(n, 1024, 512))
    report("wide1024 r256", variant(n, 256, 1024))
    report("wide1024 r512", variant(n, 512, 1024))
    report("wide2048 r256", variant(n, 256, 2048))
    report("2acc rows2048", variant(n, 2048, 128, nacc=2))
    report("2acc wide512", variant(n, 512, 512, nacc=2))
    report("noop rows2048", variant(n, 2048, 128, noop=True))
    report("noop wide512", variant(n, 512, 512, noop=True))


if __name__ == "__main__":
    main()
