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

Exclusive conversion is `inclusive - x + carry`, exact for wrapping uint32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._pallas_common import LANES, cdiv, col_ids, interpret_mode, pick_block_rows, round_up


def _scan_lanes_inclusive(x: jax.Array) -> jax.Array:
    """Inclusive scan along the lane (minor) axis via log-step shifted adds —
    the VPU analog of the subgroup shuffle tree (BlellochScan.hpp:34)."""
    cols = col_ids(x.shape)
    s = 1
    while s < x.shape[-1]:
        shifted = pltpu.roll(x, s, axis=x.ndim - 1)
        x = x + jnp.where(cols >= s, shifted, jnp.zeros_like(x))
        s *= 2
    return x


def _scan_rows_inclusive(x: jax.Array) -> jax.Array:
    """Inclusive scan along the sublane (second-minor) axis, same scheme."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    s = 1
    while s < x.shape[-2]:
        shifted = pltpu.roll(x, s, axis=x.ndim - 2)
        x = x + jnp.where(rows >= s, shifted, jnp.zeros_like(x))
        s *= 2
    return x


def tile_inclusive_rowmajor(x: jax.Array) -> jax.Array:
    """Inclusive scan of a (R, 128) tile in row-major element order."""
    inc = _scan_lanes_inclusive(x)
    totals = inc[:, LANES - 1 : LANES]  # (R, 1) row sums
    # measured (proto/scan_lab.py, 268M on v5e): the sublane log-scan of the
    # (R, 1) column beats narrow_cumsum_incl here at every block size (the
    # (R,1)->(R/128,128) reshape relayout costs more than full-width saves
    # in this kernel, unlike in the sort where the narrow scan won)
    row_prefix = _scan_rows_inclusive(totals) - totals
    return inc + row_prefix


def _scan_kernel(dtype):
    def kernel(x_ref, o_ref, carry_ref):
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _():
            carry_ref[0] = jnp.zeros((), dtype)

        x = x_ref[0]
        inc = tile_inclusive_rowmajor(x)
        carry = carry_ref[0]
        o_ref[0] = inc - x + carry
        carry_ref[0] = carry + inc[x.shape[0] - 1, LANES - 1]

    return kernel


def pallas_exclusive_scan(x: jax.Array, num_partitions: int = 1) -> jax.Array:
    """Exclusive prefix sum over adjacent equal-length partitions of a 1-D x."""
    n = x.shape[0]
    dtype = x.dtype
    part = n // num_partitions
    rows0 = cdiv(part, LANES)
    # 512-row blocks: at 256 rows a 268M scan runs 8192 sequential grid
    # steps and per-step overhead eats ~17% (proto/scan_lab.py: 21.4 ms at
    # 256 rows vs 17.8 at 512 and 18.0 at 1024 for 268M)
    block_rows = pick_block_rows(rows0, max_rows=512)
    rows = round_up(max(rows0, 1), block_rows)
    padded_part = rows * LANES
    num_blocks = rows // block_rows

    seg = x.reshape(num_partitions, part)
    if padded_part != part:
        seg = jnp.pad(seg, ((0, 0), (0, padded_part - part)))
    seg3 = seg.reshape(num_partitions, rows, LANES)

    out = pl.pallas_call(
        _scan_kernel(dtype),
        grid=(num_partitions, num_blocks),
        in_specs=[
            pl.BlockSpec((1, block_rows, LANES), lambda p, b: (p, b, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, block_rows, LANES), lambda p, b: (p, b, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(seg3.shape, dtype),
        scratch_shapes=[pltpu.SMEM((1,), dtype)],
        interpret=interpret_mode(),
    )(seg3)
    out2 = out.reshape(num_partitions, padded_part)
    if padded_part != part:
        out2 = out2[:, :part]
    return out2.reshape(n)
