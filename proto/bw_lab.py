"""BW ceiling lab: what copy bandwidth can this chip actually sustain?

Compares XLA elementwise (x+1), pallas copy at several block heights, and
the MXU triangular-matmul cumsum in isolation. Chained timing (axon tunnel).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NROWS = 65536          # 8.4M u32 = 33.5 MB
N = NROWS * LANES


def fence(x):
    np.asarray(jax.tree.leaves(x)[0][:1])


def chain_time(fn, args, iters=48):
    def chained(it):
        @jax.jit
        def g(state):
            return jax.lax.fori_loop(0, it, lambda i, s: (fn(s[0]),), state)
        return g
    g1, gn = chained(1), chained(1 + iters)
    fence(g1(args)); fence(gn(args))
    def t(g):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); fence(g(args)); best = min(best, time.perf_counter() - t0)
        return best
    return (t(gn) - t(g1)) / iters


def report(name, t):
    rw = 2 * N * 4 / t / 1e9
    print(f"{name:24s}: {t*1e3:7.3f} ms  {t/N*1e12:6.1f} ps/elem  {rw:6.1f} GB/s r+w", flush=True)


def pallas_copy(R):
    spec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((NROWS, LANES), jnp.uint32)
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + jnp.uint32(1)
    return lambda x: pl.pallas_call(
        kernel, grid=(NROWS // R,), in_specs=[spec], out_specs=spec, out_shape=shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024))(x)


def pallas_mm(R):
    """Isolated MXU cumsum (the round-1 faulting ingredient)."""
    spec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((NROWS, LANES), jnp.uint32)
    def kernel(x_ref, o_ref):
        z = (x_ref[:] & jnp.uint32(1)).astype(jnp.int32).astype(jnp.bfloat16)
        # triu via arithmetic (iota-compare-select i1 masks hit a Mosaic
        # relayout bug when consumed by a bf16 matmul)
        r_i = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
        triu = jnp.clip(c_i - r_i + 1, 0, 1).astype(jnp.bfloat16)
        cum = jax.lax.dot_general(
            z, triu, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = cum.astype(jnp.int32).astype(jnp.uint32)
    return lambda x: pl.pallas_call(
        kernel, grid=(NROWS // R,), in_specs=[spec], out_specs=spec, out_shape=shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024))(x)


if __name__ == "__main__":
    want = sys.argv[1:] or ["xla", "copy", "mm"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 32, (NROWS, LANES), dtype=np.uint32))
    if "xla" in want:
        report("xla rot1", chain_time(lambda a: (a << jnp.uint32(1)) | (a >> jnp.uint32(31)), (x,)))
    if "copy" in want:
        for R in [256, 512, 1024, 2048, 4096, 8192]:
            report(f"pallas copy R={R}", chain_time(pallas_copy(R), (x,)))
    if "mm" in want:
        for R in [1024]:
            report(f"pallas mxu-cum R={R}", chain_time(pallas_mm(R), (x,)))
