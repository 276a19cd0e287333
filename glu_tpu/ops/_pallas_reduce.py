"""Pallas reduce kernel.

TPU-native replacement for the reference's radix-32 subgroup reduction tree
(glu/Reduce.hpp:11-38 kernel, :121-134 host loop). The reference needs
ceil(log32 N) host-synchronized dispatches, destroying its input with
partials; on TPU the whole tree is ONE kernel: a sequential grid over
(BLOCK_ROWS, 128) VMEM tiles, each grid step folding its tile into an
(8, 128) accumulator held in VMEM scratch (the register-resident analog of
the subgroup partials), and the last step collapsing the accumulator
lanes/sublanes into the scalar output in SMEM.

Non-power-of-2 sizes are handled by padding with the operator identity
(instead of the reference's per-lane bounds check, Reduce.hpp:28) — tiles
stay dense, the VPU never branches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reduce import ReduceOperator, combine_fn, identity_for
from ._pallas_common import LANES, SUBLANES, interpret_mode, pad_to_grid, pick_block_rows


_FOLDS = {
    ReduceOperator.SUM: jnp.sum,
    ReduceOperator.MUL: jnp.prod,
    ReduceOperator.MIN: jnp.min,
    ReduceOperator.MAX: jnp.max,
}


def _to_signed(x, op):
    """Mosaic has no unsigned-int reductions; map u32 into the isomorphic
    i32 domain: bitcast for sum/mul (two's-complement wraparound is the same
    ring), sign-bit flip for min/max (order isomorphism)."""
    if op in (ReduceOperator.MIN, ReduceOperator.MAX):
        x = x ^ jnp.uint32(0x80000000)
    return pltpu.bitcast(x, jnp.int32)


def _from_signed(x, op):
    x = pltpu.bitcast(x, jnp.uint32)
    if op in (ReduceOperator.MIN, ReduceOperator.MAX):
        x = x ^ jnp.uint32(0x80000000)
    return x


def _reduce_kernel(op: ReduceOperator, block_rows: int, dtype):
    combine = combine_fn(op)
    ident = identity_for(op, dtype)
    unsigned = jnp.dtype(dtype) == jnp.uint32
    acc_dtype = jnp.int32 if unsigned else dtype
    fold = _FOLDS[op]

    def fold_groups(tile):
        """Fold (G, 8, 128) -> (8, 128) along axis 0. Mosaic implements
        reduce_{sum,min,max} but not reduce_prod, so MUL folds with an
        unrolled combine chain (G is a small static constant)."""
        if op == ReduceOperator.MUL:
            acc = tile[0]
            for g in range(1, tile.shape[0]):
                acc = acc * tile[g]
            return acc
        return fold(tile, axis=0)

    def fold_full(acc):
        """Collapse (8, 128) -> scalar. For MUL, a wraparound butterfly
        (x[i] *= x[i-s], s = 1,2,4,...) makes every slot the total product
        in log steps — the VPU analog of the reference's subgroupMul
        (Reduce.hpp:33); other ops use native reductions."""
        if op == ReduceOperator.MUL:
            s = 1
            while s < acc.shape[0]:
                acc = acc * pltpu.roll(acc, s, axis=0)
                s *= 2
            s = 1
            while s < acc.shape[1]:
                acc = acc * pltpu.roll(acc, s, axis=1)
                s *= 2
            return acc[0, 0]
        return fold(acc)

    def kernel(x_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            ival = jnp.full((SUBLANES, LANES), ident, dtype=dtype)
            acc_ref[:] = _to_signed(ival, op) if unsigned else ival

        # Fold the (block_rows, 128) tile into the (8, 128) accumulator:
        # reshape groups rows by sublane so the fold is a pure VPU reduce.
        tile = x_ref[:]
        if unsigned:
            tile = _to_signed(tile, op)
        tile = tile.reshape(block_rows // SUBLANES, SUBLANES, LANES)
        acc_ref[:] = combine(acc_ref[:], fold_groups(tile))

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[0, 0] = fold_full(acc_ref[:])

    return kernel, acc_dtype


def _pallas_reduce_flat(x: jax.Array, op: ReduceOperator) -> jax.Array:
    """Reduce a 1-D array to a scalar."""
    n = x.shape[0]
    dtype = x.dtype
    rows0 = -(-n // LANES)
    # 2048-row (1 MB) blocks: fewer sequential grid steps than the original
    # 512-row cap, measured 633 -> ~700-900 GB/s effective read at 67M on
    # the v5e (24-array differenced timing; the 512-row kernel trailed
    # jnp.sum by ~10%, the 2048-row kernel matches or beats it)
    block_rows = pick_block_rows(rows0, max_rows=2048)
    padded_n, rows, num_blocks = pad_to_grid(n, block_rows)
    if padded_n != n:
        x = jnp.pad(x, (0, padded_n - n), constant_values=identity_for(op, dtype))
    x2 = x.reshape(rows, LANES)

    kernel, acc_dtype = _reduce_kernel(op, block_rows, dtype)
    out = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec((block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), acc_dtype),
        scratch_shapes=[pltpu.VMEM((SUBLANES, LANES), acc_dtype)],
        interpret=interpret_mode(),
    )(x2)
    result = out[0, 0]
    if acc_dtype != dtype:
        result = jax.lax.bitcast_convert_type(result, dtype)
        if op in (ReduceOperator.MIN, ReduceOperator.MAX):
            result = result ^ jnp.uint32(0x80000000)
    return result


def pallas_reduce(x: jax.Array, op: ReduceOperator) -> jax.Array:
    """Reduce (N,) to scalar or (N, C) to (C,) per-component results
    (vector DataTypes carry components in the trailing axis)."""
    if x.ndim == 1:
        return _pallas_reduce_flat(x, op)
    # Components become the leading axis so each is a contiguous flat stream.
    per_comp = jax.vmap(lambda col: _pallas_reduce_flat(col, op))(x.T)
    return per_comp
