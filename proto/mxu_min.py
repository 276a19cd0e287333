"""Minimal isolated tests for the MXU-in-kernel fault + platform floors.

modes:
  floor  — chained trivial pallas_call: per-dispatch overhead floor
  mm     — kernel that ONLY does the bf16 triangular matmul cumsum
  mmfold — matmul cumsum + the downstream folds (narrow cumsum, search)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, LANES, NB = 1024, 128, 64
N = NB * R * LANES


def fence(x):
    np.asarray(jax.tree.leaves(x)[0][:1])


def chain_time(fn, args, iters=8):
    def chained(it):
        @jax.jit
        def g(state):
            return jax.lax.fori_loop(0, it, lambda i, s: (fn(*s),) if not isinstance(fn(*s), tuple) else fn(*s), state)
        return g
    g1, gn = chained(1), chained(1 + iters)
    fence(g1(args)); fence(gn(args))
    def t(g):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); fence(g(args)); best = min(best, time.perf_counter() - t0)
        return best
    return (t(gn) - t(g1)) / iters


spec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
shape = jax.ShapeDtypeStruct((NB * R, LANES), jnp.uint32)
params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def run(name, kernel):
    fn = lambda x: pl.pallas_call(
        kernel, grid=(NB,), in_specs=[spec], out_specs=spec, out_shape=shape,
        compiler_params=params)(x)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 32, (NB * R, LANES), dtype=np.uint32))
    t = chain_time(lambda a: fn(a), (x,))
    print(f"{name}: {t*1e3:7.3f} ms  {t/N*1e12:6.1f} ps/elem", flush=True)


def k_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:] + jnp.uint32(1)


def k_mm(x_ref, o_ref):
    z = ((x_ref[:] & jnp.uint32(1))).astype(jnp.bfloat16)
    triu = jnp.triu(jnp.ones((LANES, LANES), jnp.bfloat16))
    cum = jax.lax.dot_general(
        z, triu, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = cum.astype(jnp.uint32)


def k_roll_cumsum(x_ref, o_ref):
    z = (x_ref[:] & jnp.uint32(1)).astype(jnp.int32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    s = 1
    while s < LANES:
        z = z + jnp.where(lanes >= s, pltpu.roll(z, s, axis=1), 0)
        s *= 2
    o_ref[:] = z.astype(jnp.uint32)


if __name__ == "__main__":
    want = sys.argv[1:] or ["floor", "roll", "mm"]
    if "floor" in want:
        run("floor(copy)", k_copy)
    if "roll" in want:
        run("roll-cumsum", k_roll_cumsum)
    if "mm" in want:
        run("mxu-cumsum", k_mm)
