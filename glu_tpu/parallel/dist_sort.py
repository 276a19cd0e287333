"""Distributed stable radix sort over a device mesh.

No analog exists in the reference (single-GPU, SURVEY.md §2.3); this
implements BASELINE.json's north-star capability TPU-natively:

  1. splitter sampling: each device samples local keys, all-gathers the
     samples over ICI, and takes quantiles as D-1 splitters (skew handling:
     splitters adapt to the key distribution, unlike fixed-range bits);
  2. bucket partition: each device stably partitions its shard into D
     per-destination buckets, padded to a static capacity (XLA requires
     static shapes; capacity_factor provisions headroom, and an overflow
     flag reports when a pathological distribution exceeds it);
  3. ONE all-to-all bucket exchange over ICI (cheaper than the per-pass
     exchange sketched in BASELINE.json: 1x data volume instead of 8x);
  4. stable local sort of the received blocks with the single-chip radix
     kernels, followed by a pad-compaction pass that works for ANY key value
     (including real 0xFFFFFFFF keys: pads are identified by slot position,
     never by sentinel comparison).

Stability: blocks are exchanged in source-device order, each block preserves
source order (step 2 is stable), the local sort is stable, and the
compaction pass is stable — so ties keep global input order end-to-end.

Result: device d holds keys in [splitter_{d-1}, splitter_d), sorted, in the
first `count` slots of its padded shard (pads at the tail hold 0xFFFFFFFF).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.radix_sort import radix_sort
from ..utils.errors import check_argument


def make_sort_mesh(devices=None, axis_name: str = "shards"):
    """Build a 1-D mesh over the given (default: all) devices. The library
    does not own the runtime — callers with an existing mesh pass it
    directly to distributed_radix_sort."""
    devices = jax.devices() if devices is None else devices
    return jax.make_mesh((len(devices),), (axis_name,), devices=devices)


def _sample_splitters(keys, axis_name: str, num_devices: int, num_samples: int):
    """Per-device strided (key, global index) samples -> all-gather -> global
    quantile splitters in LEXICOGRAPHIC (key, index) order.

    The index tiebreak makes every sampled element distinct, so quantiles
    split duplicate-heavy distributions (all-equal keys included) into
    balanced buckets — a key-only splitter would send every tied key to one
    device. Returns (splitter_keys, splitter_indices)."""
    n = keys.shape[0]
    me = jax.lax.axis_index(axis_name)
    stride = max(n // num_samples, 1)
    take = min(num_samples, n)
    local_samples = jax.lax.dynamic_slice(keys[::stride], (0,), (take,))
    # global index of local element i is me*n + i (device-major == stable
    # global input order)
    local_idx = (me * n + jnp.arange(take, dtype=jnp.uint32) * stride).astype(jnp.uint32)
    all_samples = jax.lax.all_gather(local_samples, axis_name, tiled=True)
    all_idx = jax.lax.all_gather(local_idx, axis_name, tiled=True)
    sk, si = jax.lax.sort((all_samples, all_idx), num_keys=2)
    m = sk.shape[0]
    # splitter i = quantile (i+1)/D; bucket i takes pairs in [s_{i-1}, s_i)
    q = (jnp.arange(1, num_devices, dtype=jnp.int32) * m) // num_devices
    return sk[q], si[q]


def _bucket_of(keys, axis_name: str, splitter_keys, splitter_idx):
    """Destination bucket of each local element under lexicographic
    (key, global index) order: the count of splitters <= (key, index)."""
    n = keys.shape[0]
    me = jax.lax.axis_index(axis_name)
    gidx = (me * n + jnp.arange(n, dtype=jnp.uint32)).astype(jnp.uint32)
    le = (splitter_keys[:, None] < keys[None, :]) | (
        (splitter_keys[:, None] == keys[None, :]) & (splitter_idx[:, None] <= gidx[None, :])
    )
    return jnp.sum(le.astype(jnp.int32), axis=0)


def _partition_to_buckets(keys, values, bucket, num_devices: int, capacity: int):
    """Stable partition of a local shard into D padded buckets.

    dest = bucket * capacity + stable rank within bucket — the same
    count/rank/scatter shape as a single radix pass, with the mesh axis
    playing the digit's role. Returns (padded [D*C] keys, values, per-bucket
    counts, overflow flag)."""
    def bucket_body(b, carry):
        rank, counts = carry
        m = bucket == b
        c = jnp.cumsum(m.astype(jnp.int32))
        return jnp.where(m, c - 1, rank), counts.at[b].set(c[-1])

    rank, counts = jax.lax.fori_loop(
        0,
        num_devices,
        bucket_body,
        (jnp.zeros(keys.shape[0], dtype=jnp.int32), jnp.zeros(num_devices, dtype=jnp.int32)),
    )
    overflow = jnp.any(counts > capacity)
    dest = bucket * capacity + rank
    # overflowing elements are dropped by scatter mode; flag reports it
    dest = jnp.where(rank < capacity, dest, num_devices * capacity)
    pad_k = jnp.full(num_devices * capacity, 0xFFFFFFFF, dtype=jnp.uint32)
    out_k = pad_k.at[dest].set(keys, mode="drop", unique_indices=True)
    out_v = jnp.zeros(num_devices * capacity, dtype=jnp.uint32).at[dest].set(
        values, mode="drop", unique_indices=True
    )
    return out_k, out_v, jnp.minimum(counts, capacity), overflow


def _compact_received(keys, values, block_counts, capacity: int, backend):
    """Stable local sort of D received blocks + positional pad compaction.

    Pads are recognized by SLOT (slot i in block b is a pad iff
    i % capacity >= counts[b]) — correct even when real keys equal the
    0xFFFFFFFF fill. The compaction is itself one stable 1-bit radix pass.
    """
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    # stable sort (key, original slot)
    sorted_keys, sorted_idx = radix_sort(keys, idx, backend=backend)
    is_pad = (sorted_idx % capacity) >= block_counts[sorted_idx // capacity].astype(jnp.uint32)
    # stable partition: reals first (flag 0), pads last (flag 1) — one
    # LSD pass over the flag bit
    _, final_idx = radix_sort(is_pad.astype(jnp.uint32), sorted_idx, num_steps=1, backend=backend)
    out_k = keys[final_idx]
    out_v = values[final_idx]
    count = jnp.sum(block_counts)
    # overwrite pad tail keys with the canonical fill for a clean contract
    pos = jnp.arange(n, dtype=jnp.int32)
    out_k = jnp.where(pos < count, out_k, jnp.uint32(0xFFFFFFFF))
    return out_k, out_v, count


def _compact_buckets(keys, values, bucket, num_devices: int):
    """Stable partition of the local shard into D contiguous (unpadded)
    buckets. Returns (keys, values, per-bucket counts, exclusive offsets)."""

    def bucket_body(b, carry):
        rank, counts = carry
        m = bucket == b
        c = jnp.cumsum(m.astype(jnp.int32))
        return jnp.where(m, c - 1, rank), counts.at[b].set(c[-1])

    rank, counts = jax.lax.fori_loop(
        0,
        num_devices,
        bucket_body,
        (jnp.zeros(keys.shape[0], dtype=jnp.int32), jnp.zeros(num_devices, dtype=jnp.int32)),
    )
    offsets = jnp.cumsum(counts) - counts
    dest = offsets[bucket] + rank
    out_k = jnp.zeros_like(keys).at[dest].set(keys, unique_indices=True)
    out_v = jnp.zeros_like(values).at[dest].set(values, unique_indices=True)
    return out_k, out_v, counts, offsets


def _exchange_ragged(bk, bv, counts, offsets, axis_name, num_devices, recv_capacity):
    """Bucket exchange via XLA's ragged all-to-all over ICI (TPU pods; not
    implemented by XLA:CPU). Receiver-side capacity: robust to per-block
    skew (e.g. pre-sorted inputs where one src->dst block holds a whole
    shard) at only `capacity_factor` x memory headroom."""
    me = jax.lax.axis_index(axis_name)
    # counts_all[s, d] = elements device s sends to device d (D x D, tiny)
    counts_all = jax.lax.all_gather(counts, axis_name)
    recv_sizes = counts_all[:, me]  # from each src to me
    # where my block starts in dst d's buffer: sum over src < me of counts_all[src, d]
    below = jnp.where(
        jnp.arange(num_devices, dtype=jnp.int32)[:, None] < me, counts_all, 0
    )
    output_offsets = jnp.sum(below, axis=0)
    total_recv = jnp.sum(recv_sizes)
    overflow = total_recv > recv_capacity
    fill_k = jnp.full((recv_capacity,), 0xFFFFFFFF, dtype=jnp.uint32)
    fill_v = jnp.zeros((recv_capacity,), dtype=jnp.uint32)
    rk = jax.lax.ragged_all_to_all(
        bk, fill_k, offsets, counts, output_offsets, recv_sizes, axis_name=axis_name
    )
    rv = jax.lax.ragged_all_to_all(
        bv, fill_v, offsets, counts, output_offsets, recv_sizes, axis_name=axis_name
    )
    return rk, rv, total_recv, overflow


def _dist_sort_shard(
    keys, values, *, axis_name, num_devices, capacity, num_samples, backend, exchange
):
    """Per-shard body (runs under shard_map; keys/values are the local shard)."""
    sk, si = _sample_splitters(keys, axis_name, num_devices, num_samples)
    bucket = _bucket_of(keys, axis_name, sk, si)

    if exchange == "ragged":
        bk, bv, counts, offsets = _compact_buckets(keys, values, bucket, num_devices)
        recv_capacity = capacity * num_devices
        rk, rv, total, overflow = _exchange_ragged(
            bk, bv, counts, offsets, axis_name, num_devices, recv_capacity
        )
        # blocks are packed from offset 0 in src order; pads form a contiguous
        # 0xFFFFFFFF tail, which a stable sort keeps after any real keys
        # (reals precede pads positionally) — no positional pad tracking needed
        out_k, out_v = radix_sort(rk, rv, backend=backend)
        pos = jnp.arange(recv_capacity, dtype=jnp.int32)
        out_k = jnp.where(pos < total, out_k, jnp.uint32(0xFFFFFFFF))
        count = total
    else:
        bk, bv, counts, overflow = _partition_to_buckets(
            keys, values, bucket, num_devices, capacity
        )
        # ONE padded bucket exchange over ICI; blocks arrive in source order.
        bk = jax.lax.all_to_all(bk.reshape(num_devices, capacity), axis_name, 0, 0)
        bv = jax.lax.all_to_all(bv.reshape(num_devices, capacity), axis_name, 0, 0)
        recv_counts = jax.lax.all_to_all(counts.reshape(num_devices, 1), axis_name, 0, 0)
        out_k, out_v, count = _compact_received(
            bk.reshape(-1), bv.reshape(-1), recv_counts.reshape(-1), capacity, backend
        )
    any_overflow = jax.lax.pmax(overflow.astype(jnp.int32), axis_name)
    return out_k, out_v, count[None], any_overflow[None]


def distributed_radix_sort(
    keys: jax.Array,
    values: jax.Array,
    mesh: jax.sharding.Mesh,
    *,
    axis_name: str = "shards",
    capacity_factor: float = 2.0,
    num_samples: int = 256,
    backend: str | None = None,
    exchange: str = "padded",
    max_retries: int = 3,
):
    """Globally sort sharded u32 (key, value) pairs across `mesh`.

    keys/values: arrays sharded (or shardable) along axis 0 over the mesh's
    `axis_name` axis; length divisible by the device count.

    Returns (keys, values, counts, overflow): keys/values are sharded
    [D * padded] arrays — device d's shard holds the d-th global key range,
    sorted and stable, in its first counts[d] slots; overflow is nonzero only
    if capacity_factor doubled `max_retries` times still could not hold the
    key skew (results are then incomplete — the overflowed elements were
    dropped; pass a larger capacity_factor or max_retries).

    exchange: "padded" (dense all_to_all with per-(src,dst) block capacity
    capacity_factor*n_local/D — portable, but range-correlated inputs like
    pre-sorted data concentrate whole shards into single blocks and can need
    capacity_factor up to D) or "ragged" (jax.lax.ragged_all_to_all with
    receiver-side capacity capacity_factor*n_local — robust to block-level
    skew; XLA implements it for TPU, not CPU).

    Overflow handling is LOSSLESS for max_retries > 0: inputs are never
    donated, so when an attempt reports overflow the sort is simply re-run
    with doubled capacity (a fresh XLA program; the failed attempt's outputs
    are discarded). The device-side drop only ever reaches the caller on the
    final attempt. Each retry costs one host round trip for the flag fetch.
    """
    num_devices = mesh.shape[axis_name]
    check_argument(keys.ndim == 1 and values.ndim == 1, "keys/values must be 1-D")
    check_argument(keys.shape == values.shape, "keys/values length mismatch")
    check_argument(
        keys.shape[0] % num_devices == 0,
        "global length %d not divisible by %d devices",
        keys.shape[0],
        num_devices,
    )
    local_n = keys.shape[0] // num_devices
    spec = jax.sharding.PartitionSpec(axis_name)

    def attempt(cf: float):
        capacity = int(np.ceil(cf * local_n / num_devices))
        body = partial(
            _dist_sort_shard,
            axis_name=axis_name,
            num_devices=num_devices,
            capacity=capacity,
            num_samples=min(num_samples, local_n),
            backend=backend,
            exchange=exchange,
        )
        fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(spec, spec),
                out_specs=(spec, spec, spec, spec),
                check_vma=False,
            )
        )
        return fn(keys, values)

    cf = capacity_factor
    out = attempt(cf)
    for _ in range(max_retries):
        if not np.any(np.asarray(out[3])):
            break
        # ceiling: capacity D*local_n/D = local_n per (src,dst) block can
        # hold ANY distribution, so doubling always terminates
        cf = min(cf * 2.0, float(num_devices))
        out = attempt(cf)
    return out
