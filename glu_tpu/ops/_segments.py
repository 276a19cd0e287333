"""Shared validation for CUB-style segment boundary arrays.

The ragged (offsets=) forms of the sort, scan, and reduce all take the
same contract: S+1 nondecreasing integer boundaries with offsets[0] == 0
and offsets[-1] == n, empty segments allowed. Validation happens on the
host when the array is concrete; traced boundary arrays skip it (only
their COUNT is static), keeping every form trace-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.errors import check_argument


def validate_offsets(offsets, n: int):
    """Returns (offsets as a jnp array, num_segments)."""
    offs = jnp.asarray(offsets)
    check_argument(offs.ndim == 1, "offsets must be 1-D")
    check_argument(
        jnp.issubdtype(offs.dtype, jnp.integer), "offsets must be integers, got %s", offs.dtype
    )
    num_segments = offs.shape[0] - 1
    check_argument(num_segments >= 1, "offsets needs at least 2 entries")
    if not isinstance(offs, jax.core.Tracer):  # concrete: validate the contract
        import numpy as np

        h = np.asarray(offs)
        check_argument(int(h[0]) == 0, "offsets[0] must be 0, got %d", int(h[0]))
        check_argument(
            int(h[-1]) == n, "offsets[-1] (%d) must equal the array length (%d)", int(h[-1]), n
        )
        check_argument(bool((h[1:] >= h[:-1]).all()), "offsets must be nondecreasing")
    return offs, num_segments
