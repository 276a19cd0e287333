"""Distributed bucket-partition cost lab (round 5, VERDICT #3).

The partition pass — a stable sort of the local shard by destination bucket
id carrying (key, value) payloads — is the distributed pipeline's largest
non-sort overhead (0.75 ns/key at D <= 16, 1.4 at D = 64, r04 scaling
model). Variants priced here on the real chip:

  steps:  the r04 shipped form — radix_sort_multi(num_steps=ceil(bits/4)),
          full 4-bit digits (4 splits/pass, 1 splice/pass)
  bits:   prune to EXACTLY ceil(log2 D) bucket bits (engine bit-pruned
          path; D=2 is ONE split)
  wide:   bits + the round-5 wide-field single pass: 5-7 bits group in one
          pass of 2**b bins with ONE splice (vs 2 passes / 2 splices)

Usage: python proto/partition_lab.py [log2_local_n]
"""
import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from bench import _chain_time, _rand_u32
from glu_tpu import radix_sort_multi
from glu_tpu.parallel.dist_sort import _num_bucket_steps


def partition_fn(D, mode):
    nb = max(int(D - 1).bit_length(), 1)

    def f(state):
        kk, vv = state
        b = (kk % jnp.uint32(D)).astype(jnp.uint32)
        if mode == "steps":
            sb, (ok, ov) = radix_sort_multi(
                b, (kk, vv), num_steps=_num_bucket_steps(D), backend="pallas"
            )
        else:  # "bits" == the shipped round-5 form (wide field engages >4 bits)
            sb, (ok, ov) = radix_sort_multi(
                b, (kk, vv), backend="pallas", bits=tuple(range(nb))
            )
        offs = jnp.searchsorted(
            sb, jnp.arange(D, dtype=jnp.uint32), side="left"
        ).astype(jnp.int32)
        return ok, ov + offs[0].astype(jnp.uint32)

    return f


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    local_n = 1 << lg
    k = _rand_u32(local_n, 1)
    v = jnp.arange(local_n, dtype=jnp.uint32)
    for D in (2, 4, 8, 16, 32, 64, 128, 256):
        row = [f"D={D:4d}"]
        for mode in ("steps", "bits"):
            t = _chain_time(partition_fn(D, mode), (k, v), 4)
            row.append(f"{mode} {t/local_n*1e9:6.3f} ns/key")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
