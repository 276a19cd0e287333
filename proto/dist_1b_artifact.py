"""BASELINE.json config #5 artifact: distributed sort of 1B+ pairs with a
skewed (zipf 1.3) key distribution, on the 8-virtual-device CPU mesh (no
pod attached; the virtual mesh exercises the identical shard_map program).

Verification is device-side (no host oracle sort at 1B):
  - overflow flag clear, counts sum to n;
  - each shard's valid prefix is ascending;
  - shard boundaries are non-decreasing (global order);
  - key-multiset checksums (wrapping sum + nonlinear mix) match the input;
  - pairing checksum: sum of mix(key, value) over outputs equals
    sum of mix(key, iota) over inputs (values are the identity iota).

Writes one JSON line to stdout; run detached and redirect to a log.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from glu_tpu.parallel import distributed_radix_sort, make_sort_mesh

N = 1 << 30  # 1,073,741,824 pairs
D = 8


def mix(k, v):
    return (k * jnp.uint32(0x9E3779B9)) ^ v


def main():
    mesh = make_sort_mesh()
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    k = rng.zipf(1.3, size=N).astype(np.uint32)
    v = np.arange(N, dtype=np.uint32)
    gen_s = time.perf_counter() - t0
    sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("shards"))
    ks = jax.device_put(jnp.asarray(k), sh)
    vs = jax.device_put(jnp.asarray(v), sh)

    @jax.jit
    def in_checks(ks, vs):
        return (
            jnp.sum(ks, dtype=jnp.uint32),
            jnp.sum(mix(ks, jnp.uint32(0)), dtype=jnp.uint32),
            jnp.sum(mix(ks, vs), dtype=jnp.uint32),
        )

    in_sum, in_mix, in_pair = (np.uint32(x) for x in jax.device_get(in_checks(ks, vs)))
    del k, v

    t0 = time.perf_counter()
    out_k, out_v, counts, overflow = distributed_radix_sort(ks, vs, mesh, backend="xla")
    jax.block_until_ready((out_k, out_v, counts, overflow))
    sort_s = time.perf_counter() - t0

    counts_h = np.asarray(counts)
    ovf = int(np.asarray(overflow)[0])
    padded = out_k.shape[0] // D

    @jax.jit
    def out_checks(out_k, out_v, counts):
        k2 = out_k.reshape(D, padded)
        v2 = out_v.reshape(D, padded)
        pos = jnp.arange(padded, dtype=jnp.int32)[None, :]
        valid = pos < counts[:, None]
        kz = jnp.where(valid, k2, 0)
        sorted_ok = jnp.all(
            jnp.where(valid[:, 1:], k2[:, 1:] >= k2[:, :-1], True)
        )
        lasts = jnp.max(jnp.where(valid, k2, 0), axis=1)
        firsts = k2[:, 0]
        # boundary comparison happens on HOST: slicing the sharded (D,)
        # firsts/lasts along the mesh axis is not implemented by XLA
        return (
            sorted_ok,
            firsts,
            lasts,
            jnp.sum(kz, dtype=jnp.uint32),
            jnp.sum(jnp.where(valid, mix(k2, jnp.uint32(0)), 0), dtype=jnp.uint32),
            jnp.sum(jnp.where(valid, mix(k2, v2), 0), dtype=jnp.uint32),
        )

    so, firsts, lasts, os_, om, op_ = jax.device_get(out_checks(out_k, out_v, counts))
    firsts, lasts = np.asarray(firsts), np.asarray(lasts)
    ne = counts_h > 0
    bo = bool(np.all((firsts[1:] >= lasts[:-1]) | ~(ne[1:] & ne[:-1])))
    ok = (
        ovf == 0
        and int(counts_h.sum()) == N
        and bool(so)
        and bool(bo)
        and np.uint32(os_) == in_sum
        and np.uint32(om) == in_mix
        and np.uint32(op_) == in_pair
    )
    print(
        json.dumps(
            {
                "artifact": "dist_sort_1B_skewed_virtual8",
                "n": N,
                "devices": D,
                "distribution": "zipf_1.3",
                "ok": bool(ok),
                "overflow": ovf,
                "counts_sum": int(counts_h.sum()),
                "sorted_within_shards": bool(so),
                "shard_boundaries_ordered": bool(bo),
                "key_sum_match": bool(np.uint32(os_) == in_sum),
                "key_mix_match": bool(np.uint32(om) == in_mix),
                "pairing_match": bool(np.uint32(op_) == in_pair),
                "elapsed_sort_s": round(sort_s, 1),
                "elapsed_keygen_s": round(gen_s, 1),
                "note": "8 virtual CPU devices (no pod attached): correctness/capability artifact for BASELINE config #5, not a hardware throughput claim",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
