"""Pallas radix-sort kernels.

TPU-native replacement for the reference's per-pass count/scan/reorder GLSL
pipeline (glu/RadixSort.hpp:33-57 count, :311 scan, :60-183 reorder). Per
4-bit pass:

  K1 `histogram`: grid over GROUPs of 8 tiles (tile = BLOCK_ROWS x 128 keys;
     grouping by 8 keeps every block shape (8k, 128)-aligned for Mosaic).
     The per-tile 16-bin digit histogram is a vectorized one-hot count — TPU
     has no fast global atomics, so the reference's per-key atomicAdd
     (:42-48) becomes dense predicate-sums on the VPU. Output layout:
     (groups, 8, 128) — row j = tile j of the group, lane d = digit d count.

  glue (jnp, tiny): the [tiles, 16] table is scanned exactly like the
     reference's 16-partition BlellochScan of [digit][block] (:311) —
     per-digit exclusive scan over tiles plus the global digit exclusive
     scan gives bases[t, d] = global start of tile t's digit-d run.

  K2 `rank`: recomputes digits and, per digit, a row-major inclusive one-hot
     scan of each tile (the in-register analog of the reference's 16 serial
     shared-memory 1024-wide Blelloch scans, :157-181 — its hottest loop),
     producing each element's stable global destination
     dest = bases[tile, d] + local_rank.

  scatter: the destinations form a permutation; the movement is realized
     with XLA's native scatter (unique indices). [A run-structured DMA
     writer is the planned upgrade.]

The radix shift is a runtime scalar (SMEM input) so ONE compiled kernel
serves all 8 passes — the analog of the reference's u_radix_shift uniform
(RadixSort.hpp:303) — letting the pass loop be a lax.fori_loop.

Padding: keys are padded to a whole number of tile-groups with 0xFFFFFFFF.
Pad elements start at the tail and — having the maximal digit every pass,
plus stability — remain at the tail after every pass, so out[:n] is exact
and no kernel needs bounds masks (the TPU analog of the reference's
in-kernel `if key_index < u_count` checks, RadixSort.hpp:41,160).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._pallas_common import LANES, interpret_mode, round_up
from ._pallas_scan import tile_inclusive_rowmajor
from .radix_sort import RADIX, RADIX_BITS

BLOCK_ROWS = 32  # rows per tile: tile = 32 x 128 = 4096 keys (reference blocks: 1024)
TILE = BLOCK_ROWS * LANES
TILES_PER_GROUP = 8  # tiles per grid step; gives (8, 128)-aligned hist/bases blocks
GROUP = TILES_PER_GROUP * TILE


def _hist_kernel(shift_ref, k_ref, hist_ref):
    shift = shift_ref[0].astype(jnp.uint32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILES_PER_GROUP, LANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (TILES_PER_GROUP, LANES), 1)
    res = jnp.zeros((TILES_PER_GROUP, LANES), dtype=jnp.int32)
    for j in range(TILES_PER_GROUP):
        digit = (k_ref[j * BLOCK_ROWS : (j + 1) * BLOCK_ROWS, :] >> shift) & jnp.uint32(
            RADIX - 1
        )
        for d in range(RADIX):
            c = jnp.sum((digit == jnp.uint32(d)).astype(jnp.int32))
            res = res + jnp.where((rows == j) & (lanes == d), c, 0)
    hist_ref[0] = res


def _rank_kernel(shift_ref, k_ref, bases_ref, dest_ref):
    shift = shift_ref[0].astype(jnp.uint32)
    for j in range(TILES_PER_GROUP):
        sl = slice(j * BLOCK_ROWS, (j + 1) * BLOCK_ROWS)
        digit = (k_ref[sl, :] >> shift) & jnp.uint32(RADIX - 1)
        dest = jnp.zeros((BLOCK_ROWS, LANES), dtype=jnp.int32)
        for d in range(RADIX):
            m = digit == jnp.uint32(d)
            cm = tile_inclusive_rowmajor(m.astype(jnp.int32))
            dest = jnp.where(m, bases_ref[0, j, d] + cm - 1, dest)
        dest_ref[sl, :] = dest


def _pass_dest(keys2d: jax.Array, shift: jax.Array, num_groups: int) -> jax.Array:
    """Compute each element's stable destination index for one pass."""
    interp = interpret_mode()
    shift_arr = shift.reshape(1).astype(jnp.int32)
    group_rows = TILES_PER_GROUP * BLOCK_ROWS

    hists = pl.pallas_call(
        _hist_kernel,
        grid=(num_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((group_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILES_PER_GROUP, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_groups, TILES_PER_GROUP, LANES), jnp.int32),
        interpret=interp,
    )(shift_arr, keys2d)

    # [tiles, 16] offset table — the reference's 16-partition Blelloch scan
    # (RadixSort.hpp:311) collapsed into two tiny cumsums on the host graph.
    num_tiles = num_groups * TILES_PER_GROUP
    hist_t16 = hists.reshape(num_tiles, LANES)[:, :RADIX]
    tile_excl = jnp.cumsum(hist_t16, axis=0) - hist_t16
    totals = jnp.sum(hist_t16, axis=0)
    starts = jnp.cumsum(totals) - totals
    bases16 = (starts[None, :] + tile_excl).astype(jnp.int32)
    bases = jnp.zeros((num_tiles, LANES), dtype=jnp.int32).at[:, :RADIX].set(bases16)
    bases = bases.reshape(num_groups, TILES_PER_GROUP, LANES)

    dest = pl.pallas_call(
        _rank_kernel,
        grid=(num_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((group_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, TILES_PER_GROUP, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((group_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(keys2d.shape, jnp.int32),
        interpret=interp,
    )(shift_arr, keys2d, bases)
    return dest.reshape(-1)


@partial(jax.jit, static_argnames=("num_steps",))
def _sort_padded(keys: jax.Array, values, num_steps: int):
    padded_n = keys.shape[0]
    num_groups = padded_n // GROUP

    def one_pass(step, keys, values):
        keys2d = keys.reshape(num_groups * TILES_PER_GROUP * BLOCK_ROWS, LANES)
        dest = _pass_dest(keys2d, step * RADIX_BITS, num_groups)
        out_k = jnp.zeros_like(keys).at[dest].set(keys, unique_indices=True)
        if values is None:
            return out_k, None
        return out_k, jnp.zeros_like(values).at[dest].set(values, unique_indices=True)

    if values is None:
        return jax.lax.fori_loop(0, num_steps, lambda s, k: one_pass(s, k, None)[0], keys), None
    return jax.lax.fori_loop(
        0, num_steps, lambda s, kv: one_pass(s, kv[0], kv[1]), (keys, values)
    )


def pallas_radix_sort(keys: jax.Array, values, num_steps: int):
    """Stable LSD radix sort of u32 keys (+ optional u32 values), k passes."""
    n = keys.shape[0]
    padded_n = round_up(max(n, GROUP), GROUP)
    if padded_n != n:
        keys = jnp.pad(keys, (0, padded_n - n), constant_values=jnp.uint32(0xFFFFFFFF))
        if values is not None:
            values = jnp.pad(values, (0, padded_n - n))
    keys, values = _sort_padded(keys, values, num_steps)
    if padded_n != n:
        keys = keys[:n]
        if values is not None:
            values = values[:n]
    return keys, values
