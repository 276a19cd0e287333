"""Bisect the d=1 distributed-sort composition slowdown on real TPU.

bench.py --dist at d=1/67M measured 1.18 M keys/s vs 154 M for the plain
sort — an ~86x pathology somewhere in the shard_map program. Stage
variants, cumulative:
  sample    splitter sampling only
  bucket    + bucket-of + partition (no-op at d=1)
  spread    + spread_to_padded + all_to_all + compact
  sort      + final local sort (the full pipeline)
Usage: python proto/dist_d1_lab.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from glu_tpu.parallel import dist_sort as ds
from glu_tpu.ops.radix_sort import radix_sort


def fence(x):
    np.asarray(jax.tree.leaves(x)[0][:1])


def timeit(fn, *args, reps=3):
    fence(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 26
    mesh = ds.make_sort_mesh(jax.devices())
    D = mesh.shape["shards"]
    axis = "shards"
    capacity = int(np.ceil(1.5 * n / D / D))
    rng = np.random.default_rng(5)
    keys = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    vals = jnp.arange(n, dtype=jnp.uint32)
    spec = jax.sharding.PartitionSpec(axis)
    sh = jax.sharding.NamedSharding(mesh, spec)
    keys = jax.device_put(keys, sh)
    vals = jax.device_put(vals, sh)

    def shard(body):
        return jax.jit(
            jax.shard_map(body, mesh=mesh, in_specs=(spec, spec),
                          out_specs=(spec, spec), check_vma=False)
        )

    def body_sample(k, v):
        sk, si = ds._sample_splitters(k, axis, D, min(256, n // D))
        return k + sk.sum(dtype=jnp.uint32), v

    def body_bucket(k, v):
        sk, si = ds._sample_splitters(k, axis, D, min(256, n // D))
        bucket = ds._bucket_of(k, axis, sk, si)
        arrays, counts, offsets = ds._partition_by_bucket(bucket, [k, v], D, None)
        return arrays[0] + counts.sum().astype(jnp.uint32), arrays[1]

    def body_spread(k, v):
        sk, si = ds._sample_splitters(k, axis, D, min(256, n // D))
        bucket = ds._bucket_of(k, axis, sk, si)
        arrays, counts, offsets = ds._partition_by_bucket(bucket, [k, v], D, None)
        padded, sent, overflow = ds._spread_to_padded(
            arrays, [ds._PAD_KEY, 0], counts, offsets, D, capacity)
        received = [jax.lax.all_to_all(p, axis, 0, 0) for p in padded]
        recv_counts = jax.lax.all_to_all(sent.reshape(D, 1), axis, 0, 0)
        compacted, count = ds._compact_blocks(
            received, [ds._PAD_KEY, 0], recv_counts.reshape(-1), D, capacity)
        return compacted[0][: n // D], compacted[1][: n // D]

    def body_full(k, v):
        ok, ov, c, o = ds._dist_sort_shard(
            k, v, axis_name=axis, num_devices=D, capacity=capacity,
            num_samples=min(256, n // D), backend=None, exchange="padded")
        return ok[: n // D], ov[: n // D]

    print(f"n={n} D={D} capacity={capacity}", flush=True)
    # plain-sort baseline on UNSHARDED arrays (explicitly-sharded inputs
    # trip sharding-typed select inside the pallas host code)
    ku = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    vu = jnp.arange(n, dtype=jnp.uint32)
    t = timeit(jax.jit(lambda k, v: radix_sort(k, v)), ku, vu)
    print(f"plain sort       : {t*1e3:9.1f} ms  {n/t/1e6:8.1f} M keys/s", flush=True)
    for name, body in [("sample", body_sample), ("bucket", body_bucket),
                       ("spread", body_spread), ("full", body_full)]:
        t = timeit(shard(body), keys, vals)
        print(f"{name:17s}: {t*1e3:9.1f} ms  {n/t/1e6:8.1f} M keys/s", flush=True)


if __name__ == "__main__":
    main()
