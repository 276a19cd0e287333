"""Golden reference implementations in plain jnp.

These are the oracles the kernels are tested against — the analog of the
reference test suite's STL oracles (std::accumulate, std::exclusive_scan,
std::stable_sort; reference test/reduce_tests.cpp:147-164,
test/blelloch_scan_tests.cpp:28-46, test/radix_sort_tests.cpp:20-51). They
are deliberately the simplest correct expression of each op's contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ref_reduce(x: jax.Array, op: str) -> jax.Array:
    """Reduce along axis 0 with `op` in {sum, mul, min, max}.

    Matches reference Reduce semantics (glu/Reduce.hpp:42-48): the result for
    a (N,) array is a scalar; for (N, C) vector arrays it is the per-component
    (C,) reduction.
    """
    if op == "sum":
        return jnp.sum(x, axis=0, dtype=x.dtype)
    if op == "mul":
        return jnp.prod(x, axis=0, dtype=x.dtype)
    return {"min": jnp.min, "max": jnp.max}[op](x, axis=0)


def ref_exclusive_scan(x: jax.Array, num_partitions: int = 1) -> jax.Array:
    """Exclusive prefix sum over `num_partitions` adjacent equal partitions.

    Matches reference BlellochScan semantics (glu/BlellochScan.hpp:125-138):
    partition p of length L = x.size/num_partitions is scanned independently;
    sums wrap naturally in the array dtype (u32 mod 2^32).
    """
    n = x.shape[0]
    part = n // num_partitions
    seg = x.reshape(num_partitions, part)
    inc = jnp.cumsum(seg, axis=1, dtype=x.dtype)
    exc = inc - seg
    return exc.reshape(n)


def ref_radix_sort(keys: jax.Array, values: jax.Array, num_steps: int = 0):
    """Stable sort of u32 (key, value) pairs by the low 4*num_steps key bits.

    num_steps=0 means a full 8-pass sort (reference glu/RadixSort.hpp:289,332:
    the loop breaks at `step == num_steps || step == 8`). A partial sort's
    observable state equals a stable sort by the masked low bits — LSD passes
    never look at higher bits.
    """
    steps = 8 if num_steps in (0, None) else min(int(num_steps), 8)
    if steps == 0:
        return keys, values
    mask = jnp.uint32((1 << (4 * steps)) - 1) if steps < 8 else jnp.uint32(0xFFFFFFFF)
    sort_key = keys & mask
    _, out_k, out_v = jax.lax.sort((sort_key, keys, values), is_stable=True, num_keys=1)
    return out_k, out_v
