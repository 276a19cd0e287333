"""Shared plumbing for the Pallas TPU kernels.

The kernels in _pallas_*.py are the device layer (L2 analog of the
reference's embedded GLSL compute shaders, e.g. glu/Reduce.hpp:11-38) —
except that where the reference textually specializes shader source with
#defines and compiles per (dtype, op) at object construction
(glu/Reduce.hpp:68-99), here Python closures specialize the kernel and
jax.jit/Mosaic cache the compilation per (dtype, op, tile shape).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (re-exported for kernels)

LANES = 128  # TPU lane count: minor dim of every VMEM tile
SUBLANES = 8  # f32/i32 sublane count: minimum second-minor dim

_INTERPRET_ENV = "GLU_TPU_PALLAS_INTERPRET"


def interpret_mode() -> bool:
    """True when kernels should run under the Pallas interpreter — the race/
    correctness checker for hand-scheduled kernels (SURVEY.md §5), and how the
    CPU test suite exercises kernel logic without a TPU."""
    return os.environ.get(_INTERPRET_ENV, "0") == "1"


def round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pick_block_rows(rows: int, max_rows: int = 256) -> int:
    """Choose a row-block height: multiple of SUBLANES, capped, and small
    enough not to overshoot tiny inputs by more than one block."""
    r = round_up(max(rows, 1), SUBLANES)
    return min(r, max_rows)


def pad_to_grid(n: int, block_rows: int) -> tuple[int, int, int]:
    """Pad a flat length n to a (rows, LANES) layout with rows a multiple of
    block_rows. Returns (padded_n, rows, num_blocks)."""
    rows = cdiv(n, LANES)
    rows = round_up(max(rows, 1), block_rows)
    return rows * LANES, rows, rows // block_rows


def narrow_cumsum_incl(col, rows_n: int):
    """Inclusive cumsum of an (R, 1) column. A direct sublane log-scan runs
    at 1/128 lane utilization (every roll pays a full vreg pass over 127
    padding lanes); for R a multiple of 128 the column is reshaped to
    (R/128, 128) and scanned in row-major order at full VPU width, then
    reshaped back. Shared by the sort's block-offset scan and the scan
    kernel's row-total scan."""
    import jax
    from jax.experimental.pallas import tpu as pltpu_

    def col_scan(x, n):
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
        s = 1
        while s < n:
            x = x + jnp.where(rows >= s, pltpu_.roll(x, s, axis=x.ndim - 2), 0)
            s *= 2
        return x

    if rows_n % LANES != 0 or rows_n < LANES:
        return col_scan(col, rows_n)
    t = col.reshape(rows_n // LANES, LANES)
    lanes = col_ids(t.shape)
    s = 1
    while s < LANES:
        t = t + jnp.where(lanes >= s, pltpu_.roll(t, s, axis=1), 0)
        s *= 2
    totals = t[:, LANES - 1 : LANES]
    row_pre = col_scan(totals, rows_n // LANES) - totals
    return (t + row_pre).reshape(rows_n, 1)


def row_ids(shape):
    import jax

    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def col_ids(shape):
    import jax

    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)
