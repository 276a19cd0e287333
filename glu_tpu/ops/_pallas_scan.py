"""Pallas Blelloch-scan kernel.

TPU-native replacement for the reference's 2*log2(N) upsweep/downsweep
dispatches (glu/BlellochScan.hpp:142-190). One sequential-grid kernel:

  - each grid step loads a (BLOCK_ROWS, 128) VMEM tile and computes its
    row-major inclusive scan fully in-register: a log-step scan along lanes,
    a log-step scan of row totals along sublanes, then the recombination —
    this is the in-tile analog of the reference's whole up+down tree;
  - a scalar carry chained through SMEM scratch across grid steps replaces
    the host-synchronized level loop (the reference pays a glMemoryBarrier
    per level; we pay nothing — the grid is sequential on-core);
  - the reference's `num_partitions` batch mode (grid-y = partition,
    BlellochScan.hpp:125-138) maps to a leading grid axis that resets the
    carry at each partition boundary.

Operators: the reference hardcodes `+` (BlellochScan.hpp:99-100); here the
kernel is generic over sum/mul/min/max. Exclusive conversion for sum is
`inclusive - x + carry` (exact for wrapping uint32); non-invertible ops
(min/max; mul has zero divisors) instead shift the inclusive tile by one
row-major slot — a lane roll plus a sublane roll of the last-lane column —
and seed slot 0 with the operator identity. Unsigned u32 runs through the
same Mosaic isomorphisms as the reduce kernel (_pallas_reduce.py): bitcast
to i32 for mul (same ring mod 2^32), sign-bit flip for min/max (order
isomorphism).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .reduce import ReduceOperator, combine_fn, identity_for
from ._pallas_common import LANES, cdiv, col_ids, interpret_mode, pick_block_rows, round_up


def _scan_lanes_inclusive(x: jax.Array, combine=jnp.add, identity=0) -> jax.Array:
    """Inclusive scan along the lane (minor) axis via log-step shifted
    combines — the VPU analog of the subgroup shuffle tree
    (BlellochScan.hpp:34)."""
    cols = col_ids(x.shape)
    ident = jnp.full_like(x, identity)
    s = 1
    while s < x.shape[-1]:
        shifted = pltpu.roll(x, s, axis=x.ndim - 1)
        x = combine(x, jnp.where(cols >= s, shifted, ident))
        s *= 2
    return x


def _tri_u_bf16(strict: bool = False) -> jax.Array:
    """U[l, j] = 1.0 if l <= j (or l < j when strict) else 0.0 — the 128x128
    (strict) upper-triangular ones matrix, built arithmetically (i1
    iota-compare masks feeding bf16 matmuls trip a Mosaic relayout bug on
    this stack)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return jnp.clip(c - r + (0 if strict else 1), 0, 1).astype(jnp.bfloat16)


def _mxu_lane_scan_32(x: jax.Array, strict: bool = False) -> jax.Array:
    """In-row prefix (inclusive, or EXCLUSIVE when strict) of a (R, 128)
    u32/i32 tile on the MXU, exact mod 2^32: byte planes are exact in bf16
    (<= 255, 8 significant bits), per-plane row prefixes are <= 128*255 =
    32640 — exact in the MXU's f32 accumulation and in the f32 -> i32 cast —
    and the shifted recombination wraps in u32 exactly like the scalar sum.
    Replaces the 7-step lane roll-scan: lane rotates cost ~8x a sublane op
    (NOTES.md "Measured VPU cost model"), and the matmuls run on the
    otherwise-idle MXU — measured 66.2 -> 52.7 ps/elem at 268M,
    proto/scan_mxu_lab.py; the strict (exclusive) form drops the full-tile
    `inc - x` conversion from the scan kernel (proto/scan_phase_lab.py)."""
    xi = pltpu.bitcast(x, jnp.int32) if x.dtype == jnp.uint32 else x
    u = _tri_u_bf16(strict)
    dn = (((1,), (0,)), ((), ()))
    out = jnp.zeros(x.shape, jnp.uint32)
    for b in range(4):
        plane = ((xi >> (8 * b)) & 0xFF).astype(jnp.bfloat16)
        y = jax.lax.dot_general(plane, u, dn, preferred_element_type=jnp.float32)
        # Mosaic has no f32 -> u32 cast; go through i32 (exact: y <= 32640)
        out = out + (pltpu.bitcast(y.astype(jnp.int32), jnp.uint32) << (8 * b))
    return out if x.dtype == jnp.uint32 else pltpu.bitcast(out, jnp.int32)


def _col_prefix_wide(totals: jax.Array, combine=jnp.add, identity=0):
    """Inclusive sublane prefix of an (R, 1) column, computed on a
    lane-REPLICATED (R, 128) copy and sliced back to (R, 1).

    The direct (R, 1) sublane log-scan is pathological on this stack — the
    narrow layout relayouts per roll step; phase-profiled at +23 ps/elem of
    the whole block, ~40% of the round-2 scan kernel (proto/scan_phase_lab.py:
    full4 14.2 ms vs colwide 8.8 ms at 268M). The reshape-to-(R/128, 128)
    trick (narrow_cumsum_incl) is worse still inside this kernel (23.8 ms).
    Scanning 128 redundant lane copies costs almost nothing: sublane rolls on
    a full-width tile run at issue peak."""
    R = totals.shape[0]
    wide = jax.lax.broadcast_in_dim(totals, (R, LANES), (0, 1))
    rows = jax.lax.broadcasted_iota(jnp.int32, wide.shape, 0)
    ident = jnp.full_like(wide, identity)
    s = 1
    while s < R:
        shifted = pltpu.roll(wide, s, axis=0)
        wide = combine(wide, jnp.where(rows >= s, shifted, ident))
        s *= 2
    return wide[:, 0:1]


def tile_inclusive_rowmajor(x: jax.Array, op: ReduceOperator = ReduceOperator.SUM) -> jax.Array:
    """Inclusive scan of a (R, 128) tile in row-major element order."""
    if op == ReduceOperator.SUM:
        if x.dtype in (jnp.uint32, jnp.int32):
            inc = _mxu_lane_scan_32(x)
        else:
            inc = _scan_lanes_inclusive(x)
        totals = inc[:, LANES - 1 : LANES]  # (R, 1) row sums
        row_prefix = _col_prefix_wide(totals) - totals
        return inc + row_prefix
    combine = combine_fn(op)
    identity = identity_for(op, x.dtype)
    inc = _scan_lanes_inclusive(x, combine, identity)
    totals = inc[:, LANES - 1 : LANES]
    # exclusive row prefix without inversion: roll the inclusive row totals
    # down one sublane and seed row 0 with the identity
    tot_inc = _col_prefix_wide(totals, combine, identity)
    rows = jax.lax.broadcasted_iota(jnp.int32, totals.shape, 0)
    row_prefix = jnp.where(rows == 0, jnp.full_like(totals, identity), pltpu.roll(tot_inc, 1, axis=0))
    return combine(inc, row_prefix)


def _work_transform(dtype, op: ReduceOperator):
    """(to_work, from_work, work_dtype) for Mosaic-safe arithmetic — the same
    u32 isomorphisms as _pallas_reduce._to_signed: u32 mul runs bitcast in the
    i32 ring, u32 min/max in the sign-flipped i32 order; sum and all signed/
    float dtypes run natively."""
    if jnp.dtype(dtype) != jnp.uint32 or op == ReduceOperator.SUM:
        return (lambda x: x), (lambda x: x), dtype
    if op == ReduceOperator.MUL:
        return (
            lambda x: pltpu.bitcast(x, jnp.int32),
            lambda x: pltpu.bitcast(x, jnp.uint32),
            jnp.int32,
        )
    # numpy scalar, not jnp: a jnp constant would be captured by the kernel
    # closure, which pallas_call rejects
    bias = jnp.dtype(jnp.uint32).type(0x80000000)
    return (
        lambda x: pltpu.bitcast(x ^ bias, jnp.int32),
        lambda x: pltpu.bitcast(x, jnp.uint32) ^ bias,
        jnp.int32,
    )


def _scan_kernel(dtype, op: ReduceOperator, block_rows: int):
    to_work, from_work, work_dtype = _work_transform(dtype, op)
    combine = combine_fn(op)
    identity = identity_for(op, work_dtype)

    def kernel(x_ref, o_ref, carry_ref):
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _():
            carry_ref[0] = jnp.full((), identity, work_dtype)

        x = to_work(x_ref[0])
        carry = carry_ref[0]
        if op == ReduceOperator.SUM and x.dtype in (jnp.uint32, jnp.int32):
            # strict-U MXU form: the matmuls emit the EXCLUSIVE in-row prefix
            # directly, dropping the full-tile `inc - x` conversion; row
            # totals recover from exc[:, -1] + x[:, -1]
            # (proto/scan_phase_lab.py "best": 14.2 -> 8.2 ms at 268M)
            exc_inrow = _mxu_lane_scan_32(x, strict=True)
            totals = exc_inrow[:, LANES - 1 : LANES] + x[:, LANES - 1 : LANES]
            tot_inc = _col_prefix_wide(totals)
            exc = exc_inrow + (tot_inc - totals) + carry
            o_ref[0] = from_work(exc)
            carry_ref[0] = carry + tot_inc[block_rows - 1, 0]
            return
        inc = tile_inclusive_rowmajor(x, op)
        if op == ReduceOperator.SUM:
            exc = inc - x + carry
        else:
            # shift the inclusive scan one row-major slot: lane-roll the tile,
            # fix lane 0 of each row from the previous row's last lane, seed
            # slot (0, 0) with the identity, then fold in the carry
            lastcol = inc[:, LANES - 1 : LANES]
            rows1 = jax.lax.broadcasted_iota(jnp.int32, lastcol.shape, 0)
            prev_row = jnp.where(
                rows1 == 0, jnp.full_like(lastcol, identity), pltpu.roll(lastcol, 1, axis=0)
            )
            cols = col_ids(x.shape)
            exc = jnp.where(cols == 0, prev_row, pltpu.roll(inc, 1, axis=1))
            exc = combine(exc, jnp.full_like(exc, carry))
        o_ref[0] = from_work(exc)
        carry_ref[0] = combine(carry, inc[block_rows - 1, LANES - 1])

    return kernel, work_dtype


def pallas_exclusive_scan(
    x: jax.Array, num_partitions: int = 1, op: ReduceOperator = ReduceOperator.SUM
) -> jax.Array:
    """Exclusive prefix scan over adjacent equal-length partitions of a 1-D x."""
    n = x.shape[0]
    dtype = x.dtype
    part = n // num_partitions
    rows0 = cdiv(part, LANES)
    # 2048-row blocks: with the wide column prefix the block-size sweep at
    # 268M reads 256: 10.3 ms, 512: 8.5, 1024: 8.2, 2048: 7.6, 4096: 7.6 —
    # within ~2% of the same-geometry in-kernel copy floor (7.4 ms), i.e.
    # DMA-bound (proto/scan_phase_lab.py "best"; round 2's 512 predates the
    # colwide fix)
    block_rows = pick_block_rows(rows0, max_rows=2048)
    rows = round_up(max(rows0, 1), block_rows)
    padded_part = rows * LANES
    num_blocks = rows // block_rows

    seg = x.reshape(num_partitions, part)
    if padded_part != part:
        # pad with the operator identity (in the ORIGINAL domain) so pads at
        # the partition tail never perturb real prefixes
        seg = jnp.pad(seg, ((0, 0), (0, padded_part - part)), constant_values=identity_for(op, dtype))
    seg3 = seg.reshape(num_partitions, rows, LANES)

    kernel, work_dtype = _scan_kernel(dtype, op, block_rows)
    out = pl.pallas_call(
        kernel,
        grid=(num_partitions, num_blocks),
        in_specs=[
            pl.BlockSpec((1, block_rows, LANES), lambda p, b: (p, b, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, block_rows, LANES), lambda p, b: (p, b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(seg3.shape, dtype),
        scratch_shapes=[pltpu.SMEM((1,), work_dtype)],
        interpret=interpret_mode(),
    )(seg3)
    out2 = out.reshape(num_partitions, padded_part)
    if padded_part != part:
        out2 = out2[:, :part]
    return out2.reshape(n)
