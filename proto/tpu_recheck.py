"""Post-outage TPU revalidation: run once when the axon tunnel recovers.

Serial single-process drive (one process per chip — NOTES.md platform
gotchas): spot-checks every public surface touched this session (scan ops,
dist partition rewrite, f32/descending dist) on the real chip, then times
the d=1 distributed composition and a min-scan against the sum-scan.
Prints one JSON line per check; exits nonzero on any failure.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(json.dumps({"check": "devices", "platform": dev.platform}), flush=True)

    import glu_tpu as glu
    from glu_tpu.parallel import distributed_radix_sort, distributed_radix_sort_f32, make_sort_mesh

    rng = np.random.default_rng(0)

    # 1. sort spot drive
    k = rng.integers(0, 1 << 32, 1_000_000, dtype=np.uint32)
    ok, ov = glu.radix_sort(jnp.asarray(k), jnp.arange(k.size, dtype=jnp.uint32))
    assert (np.asarray(ok) == np.sort(k)).all()
    print(json.dumps({"check": "sort_1M", "ok": True}), flush=True)

    # 2. scan ops on the pallas backend
    x = rng.integers(0, 1 << 32, 500_000, dtype=np.uint32)
    mins = np.asarray(glu.exclusive_scan(jnp.asarray(x), op=glu.ReduceOperator.MIN))
    oracle = np.concatenate([[np.uint32(0xFFFFFFFF)], np.minimum.accumulate(x)[:-1]])
    assert (mins == oracle).all()
    maxs = np.asarray(glu.inclusive_scan(jnp.asarray(x), op=glu.ReduceOperator.MAX))
    assert (maxs == np.maximum.accumulate(x)).all()
    print(json.dumps({"check": "scan_ops_500K", "ok": True}), flush=True)

    # 3. dist sort d=1 composition (the path the partition rewrite targets)
    mesh = make_sort_mesh()
    n = 16_777_216
    dk = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    dv = np.arange(n, dtype=np.uint32)
    out = distributed_radix_sort(jnp.asarray(dk), jnp.asarray(dv), mesh)
    assert int(np.asarray(out[3])[0]) == 0
    got = np.asarray(out[0])[: int(np.asarray(out[2])[0])]
    assert (got == np.sort(dk)).all()
    print(json.dumps({"check": "dist_d1_16M", "ok": True}), flush=True)

    # timing: chained d=1 dist sort vs plain sort (fence = host fetch)
    kj, vj = jnp.asarray(dk), jnp.asarray(dv)
    for label, fn in (
        ("dist_d1", lambda: distributed_radix_sort(kj, vj, mesh)[0]),
        ("plain", lambda: glu.radix_sort(kj, vj)[0]),
    ):
        fn()  # compile + warm
        t0 = time.perf_counter()
        r = fn()
        np.asarray(r[:1])  # fence
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {"check": f"time_{label}_16M", "elapsed_s": round(dt, 4), "mkeys_s": round(n / dt / 1e6, 1)}
            ),
            flush=True,
        )

    # 3b. ragged exchange on the real device (d=1): first-ever TPU lowering
    # + execution of the ragged_all_to_all path
    ro = distributed_radix_sort(
        jnp.asarray(dk[: 1 << 20]), jnp.asarray(dv[: 1 << 20]), mesh, exchange="ragged"
    )
    rgot = np.asarray(ro[0])[: int(np.asarray(ro[2])[0])]
    assert (rgot == np.sort(dk[: 1 << 20])).all()
    print(json.dumps({"check": "dist_ragged_d1_1M", "ok": True}), flush=True)

    # 3c. u64 + segmented single-chip timing (both use jnp.take gathers —
    # verify the gather is not pathological on TPU)
    hi = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    from glu_tpu import radix_sort_u64_parts, radix_sort_segmented

    hj = jnp.asarray(hi)
    radix_sort_u64_parts(hj, kj, vj)  # warm
    t0 = time.perf_counter()
    r = radix_sort_u64_parts(hj, kj, vj)
    np.asarray(r[0][:1])
    dt = time.perf_counter() - t0
    print(
        json.dumps({"check": "time_u64_16M", "elapsed_s": round(dt, 4), "mkeys_s": round(n / dt / 1e6, 1)}),
        flush=True,
    )
    radix_sort_segmented(kj, vj, 16)  # warm
    t0 = time.perf_counter()
    r = radix_sort_segmented(kj, vj, 16)
    np.asarray(r[0][:1])
    dt = time.perf_counter() - t0
    print(
        json.dumps({"check": "time_seg16_16M", "elapsed_s": round(dt, 4), "mkeys_s": round(n / dt / 1e6, 1)}),
        flush=True,
    )

    # 4. f32 + descending dist variants (small)
    fk = rng.standard_normal(1 << 16).astype(np.float32)
    fv = np.arange(fk.size, dtype=np.uint32)
    fo = distributed_radix_sort_f32(jnp.asarray(fk), jnp.asarray(fv), mesh)
    fgot = np.asarray(fo[0])[: int(np.asarray(fo[2])[0])]
    assert (fgot == np.sort(fk)).all()
    do = distributed_radix_sort(jnp.asarray(dv[: 1 << 16]), jnp.asarray(fv), mesh, descending=True)
    dgot = np.asarray(do[0])[: int(np.asarray(do[2])[0])]
    assert (dgot == dv[: 1 << 16][::-1]).all()
    print(json.dumps({"check": "dist_f32_desc", "ok": True}), flush=True)

    # 5. scan op timing at 16M: min vs sum (chained x8 via block_until + fetch)
    big = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    for opname, op in (("sum", glu.ReduceOperator.SUM), ("min", glu.ReduceOperator.MIN)):
        glu.exclusive_scan(big, op=op)  # warm
        t0 = time.perf_counter()
        reps = 8
        for _ in range(reps):
            r = glu.exclusive_scan(big, op=op)
        np.asarray(r[:1])
        dt = (time.perf_counter() - t0) / reps
        print(
            json.dumps({"check": f"time_scan_{opname}_16M", "elapsed_ms": round(dt * 1e3, 3)}),
            flush=True,
        )

    print(json.dumps({"check": "ALL", "ok": True}), flush=True)


if __name__ == "__main__":
    sys.exit(main())
