#!/usr/bin/env python
"""Benchmark harness.

Headline metric (BASELINE.json): sorted u32 key-value pairs per second per
chip at 268,435,456 pairs, vs the reference's 53.5 M keys/s on an RTX 2060
SUPER (reference README.md:133; 5.022 s elapsed). Prints ONE JSON line for
the driver; `--table` additionally prints the reference's full size ladder
(README.md:100-133) for reduce/scan/sort with derived throughputs.

Method parity: like the reference (GL timer query around one invocation on
warm buffers, test/radix_sort_tests.cpp:160-193), we time a warm jitted
invocation behind a device fence, after an untimed warm-up call that
triggers compilation and scratch allocation (the analog of
prepare_internal_buffers pre-warming, radix_sort_tests.cpp:187).
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from glu_tpu import ReduceOperator, exclusive_scan, radix_sort, radix_sort_keys, reduce
from glu_tpu.ops.backend import resolve_backend

BASELINE_SORT_268M_KEYS_PER_S = 53.5e6  # reference README.md:133 (268M pairs / 5.022 s)


def _rand_u32(n, seed=0):
    key = jax.random.key(seed)
    return jax.random.bits(key, (n,), dtype=jnp.uint32)


def _sync(tree):
    """Force completion by fetching one element of the first array leaf.

    jax.block_until_ready returns early on tunneled platforms (axon), so a
    real device->host fetch is the only trustworthy fence. One leaf
    suffices: an XLA executable's outputs materialize together. The fetch
    round trip itself (~30 ms through the tunnel) is measured once by
    _fence_floor() and subtracted from reported times."""
    import numpy as np

    leaf = jax.tree.leaves(tree)[0]
    shards = getattr(leaf, "addressable_shards", None)
    if shards:  # multi-device array: slicing a sharded axis needs collectives
        leaf = shards[0].data
    np.asarray(leaf if getattr(leaf, "ndim", 0) == 0 else leaf[:1])


_floor_cache = None


def _fence_floor():
    """Median round-trip cost of the fetch fence on an already-ready array."""
    global _floor_cache
    if _floor_cache is None:
        x = jnp.zeros((8,), jnp.uint32)
        _sync(x)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(x)
            ts.append(time.perf_counter() - t0)
        _floor_cache = sorted(ts)[len(ts) // 2]
    return _floor_cache


def _time_best(fn, *args, reps=3):
    """Best-of-reps wall time around a fenced call, minus the fence floor
    (compile excluded by a prior warm-up call)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - _fence_floor(), 1e-9)


def bench_sort(n, backend, reps=3, bits=None):
    keys = _rand_u32(n, 1)
    vals = jnp.arange(n, dtype=jnp.uint32)

    def run(k, v):
        return radix_sort(k, v, backend=backend, bits=bits)

    _sync(run(jnp.copy(keys), jnp.copy(vals)))  # warm-up/compile
    best = float("inf")
    for _ in range(reps):
        k, v = jnp.copy(keys), jnp.copy(vals)  # fresh donatable buffers
        _sync(k)
        _sync(v)
        t0 = time.perf_counter()
        _sync(run(k, v))
        best = min(best, time.perf_counter() - t0)
    return max(best - _fence_floor(), 1e-9)


def bench_sort_keys(n, backend, reps=3):
    """Keys-only sort (no value payload — beyond the reference's mandatory
    key+value contract, README.md:88-89): the engine routes half the words
    per split, so this is the op's speed-of-light configuration."""
    keys = _rand_u32(n, 1)

    def run(k):
        return radix_sort_keys(k, backend=backend)

    _sync(run(jnp.copy(keys)))  # warm-up/compile
    best = float("inf")
    for _ in range(reps):
        k = jnp.copy(keys)  # fresh donatable buffer
        _sync(k)
        t0 = time.perf_counter()
        _sync(run(k))
        best = min(best, time.perf_counter() - t0)
    return max(best - _fence_floor(), 1e-9)


def bench_segmented(n, backend, num_segments=4096, reps=3):
    """Variable-length segmented sort (offsets form): S random ragged
    segments over n pairs. Composition cost = full key sort + segment-id
    construction (scatter one increment per boundary + cumsum — a
    searchsorted over the boundaries measured 20x slower, see
    ops/radix_sort.py) + ceil(log16 S)-pass segment-id sort."""
    from glu_tpu import radix_sort_segmented

    keys = _rand_u32(n, 1)
    vals = jnp.arange(n, dtype=jnp.uint32)
    cuts = jnp.sort(_rand_u32(num_segments - 1, 4) % jnp.uint32(n))
    offs = jnp.concatenate(
        [jnp.zeros(1, jnp.uint32), cuts, jnp.full((1,), n, jnp.uint32)]
    ).astype(jnp.int32)

    def run(k, v):
        return radix_sort_segmented(k, v, offsets=offs, backend=backend)

    _sync(run(jnp.copy(keys), jnp.copy(vals)))  # warm-up/compile
    best = float("inf")
    for _ in range(reps):
        k, v = jnp.copy(keys), jnp.copy(vals)
        _sync(k)
        _sync(v)
        t0 = time.perf_counter()
        _sync(run(k, v))
        best = min(best, time.perf_counter() - t0)
    best = max(best - _fence_floor(), 1e-9)
    print(
        json.dumps(
            {
                "metric": f"radix_sort_segmented_keys_per_sec_n{n}_s{num_segments}",
                "value": round(n / best, 1),
                "unit": "keys/s",
                "segments": num_segments,
                "vs_kv_baseline": round(n / best / BASELINE_SORT_268M_KEYS_PER_S, 3),
            }
        )
    )


def bench_u64(n, backend, reps=3):
    """64-bit key + u32 value sort ((hi, lo) halves form — no x64 needed)."""
    from glu_tpu import radix_sort_u64_parts

    hi = _rand_u32(n, 1)
    lo = _rand_u32(n, 2)
    vals = jnp.arange(n, dtype=jnp.uint32)

    def run():
        return radix_sort_u64_parts(hi, lo, vals, backend=backend)

    _sync(run())  # warm-up/compile (inputs are copied internally, not donated)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(run())
        best = min(best, time.perf_counter() - t0)
    best = max(best - _fence_floor(), 1e-9)
    print(
        json.dumps(
            {
                "metric": f"radix_sort_u64kv_keys_per_sec_n{n}",
                "value": round(n / best, 1),
                "unit": "keys/s",
                "vs_kv_baseline": round(n / best / BASELINE_SORT_268M_KEYS_PER_S, 3),
            }
        )
    )


def calibrate_router(out_path=None, quick=False):
    """Measure the router's cost-model points on the CURRENT chip and write
    the calibration file (ops/radix_sort.py::_router_model loads it,
    preferring it to the baked v5e table). The analog of the reference
    re-specializing shaders per device at construction (Reduce.hpp:68-99):
    a cost model IS our specialization, so it must be per-device.

    Measures: 2-operand jax.lax.sort ns/key over a log2(n) ladder (+ 1/3-
    operand scaling at the largest size), and the engine's per-pass rates
    at 0/1/2 payload streams (8-pass and 1-pass points solving the fixed/
    per-pass split). Chained timing throughout (the tunnel fence swamps
    single calls)."""
    import importlib

    import jax.numpy as jnp

    # the module is shadowed by the re-exported function of the same name
    rs = importlib.import_module("glu_tpu.ops.radix_sort")

    lgs = [14, 17, 20, 24] + ([26] if quick else [26, 27, 28])
    table = []
    for lg in lgs:
        n = 1 << lg
        x = _rand_u32(n, 21)
        v = jnp.arange(n, dtype=jnp.uint32)
        it = _ladder_iters(n, 2**28 if quick else 2**30, lo=4)
        t = _chain_time(
            lambda s_: jax.lax.sort((s_[0], s_[1]), num_keys=1, is_stable=True),
            (x, v), it,
        )
        table.append([lg, round(t / n * 1e9, 3)])
        print(f"  lax 2-op 2^{lg}: {t / n * 1e9:.3f} ns/key", flush=True)
    slope = max(table[-1][1] - table[-2][1], 0.01) / (lgs[-1] - lgs[-2])
    # non-pow2 cliff: the ladder rows are exact powers of two where XLA's
    # sort has a fast path; measure the penalty at ~1.125x the last row
    nq = (1 << lgs[-1]) + (1 << (lgs[-1] - 3))
    xq = _rand_u32(nq, 23)
    vq = jnp.arange(nq, dtype=jnp.uint32)
    tq = _chain_time(
        lambda s_: jax.lax.sort((s_[0], s_[1]), num_keys=1, is_stable=True),
        (xq, vq), _ladder_iters(nq, 2**28 if quick else 2**30, lo=4),
    ) / nq * 1e9
    interp_q = table[-1][1] + slope * 0.17  # log2(1.125)
    nonpow2 = max(tq / interp_q, 1.0)
    print(f"  lax non-pow2 cliff: {tq:.3f} ns/key at {nq} -> factor {nonpow2:.3f}", flush=True)
    del xq, vq
    # operand scaling at the largest ladder size
    nb = 1 << lgs[-1]
    xb = _rand_u32(nb, 22)
    vb = jnp.arange(nb, dtype=jnp.uint32)
    itb = _ladder_iters(nb, 2**28 if quick else 2**30, lo=4)
    t2 = table[-1][1]
    t1 = _chain_time(
        lambda s_: jax.lax.sort((s_,), num_keys=1, is_stable=True)[0], xb, itb
    ) / nb * 1e9
    def _sort3(s_):
        # keep all three operands LIVE (a dead output lets XLA DCE the
        # operand and measure a 2-op sort) while returning the input pytree
        o = jax.lax.sort((s_[0], s_[1], s_[1]), num_keys=1, is_stable=True)
        return (o[0], o[1] ^ o[2])

    t3 = _chain_time(_sort3, (xb, vb), itb) / nb * 1e9
    a = t1 / t2
    b = (t3 / t2 - a) / 2
    print(f"  lax operand scale: 1-op {t1:.3f} 2-op {t2:.3f} 3-op {t3:.3f}", flush=True)

    # engine rates at the largest ladder size: 8-pass + 1-pass kv solve
    # (base, per_pass); keys-only / 2-stream reuse the same base
    def eng(streams, passes):
        def f(s_):
            k = s_[0]
            ps = tuple(s_[1] for _ in range(streams))
            ok, ovs = rs._radix_sort_streams(
                jnp.copy(k), tuple(jnp.copy(p) for p in ps), passes, "pallas"
            )
            # carry must keep the (keys, payload) pytree shape of the input
            return (ok, ovs[0] if ovs else s_[1])
        return _chain_time(f, (xb, vb), max(itb // 2, 2)) / nb * 1e9

    kv8 = eng(1, 8)
    kv1 = eng(1, 1)
    base = max(kv1 - (kv8 - kv1) / 7, 0.05)
    pp1 = (kv8 - base) / 8
    pp0 = max((eng(0, 8) - base) / 8, 0.05)
    pp2 = max((eng(2, 8) - base) / 8, 0.05)
    print(f"  engine base {base:.3f} ns/key; per-pass 0/1/2-stream "
          f"{pp0:.3f}/{pp1:.3f}/{pp2:.3f}", flush=True)

    model = {
        "device": jax.devices()[0].device_kind,
        "lax_ns_per_key": table,
        "lax_slope": round(slope, 4),
        "lax_fixed_us": 4.0,
        "lax_op_scale": [round(a, 4), round(b, 4)],
        "lax_nonpow2_factor": round(nonpow2, 4),
        "radix_fixed_us": 40.0,
        "radix_base_ns": round(base, 4),
        "radix_per_pass": {
            "0": round(pp0, 4), "1": round(pp1, 4), "2": round(pp2, 4),
        },
        "radix_per_pass_slope": round(max(pp2 - pp1, 0.01), 4),
    }
    path = out_path or rs.router_calibration_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(model, f, indent=1)
    rs._reset_router_model()
    print(json.dumps({"metric": "router_calibration", "value": 1, "unit": "file",
                      "path": path, "device": model["device"]}))
    return model


def bench_reduce(n, backend, reps=3):
    data = _rand_u32(n, 2)
    fn = lambda x: reduce(x, ReduceOperator.SUM, backend=backend)
    _sync(fn(data))
    return _time_best(fn, data, reps=reps)


def bench_scan(n, backend, reps=3):
    data = _rand_u32(n, 3)
    fn = lambda x: exclusive_scan(x, backend=backend)
    _sync(fn(data))
    return _time_best(fn, data, reps=reps)


def _fmt_ms(s):
    return f"{s * 1e3:10.3f} ms"


def _chain_time(body, init, iters):
    """Per-iteration time of `body` chained `iters` times inside one jit —
    the only way to resolve sub-fence-latency ops through the tunnel: time
    g(1) and g(1+iters) and divide the difference."""

    def chained(it):
        @jax.jit
        def g(state):
            return jax.lax.fori_loop(0, it, lambda i, s_: body(s_), state)

        return g

    g1, gn = chained(1), chained(1 + iters)
    _sync(g1(init))
    _sync(gn(init))

    def t(g):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(g(init))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((t(gn) - t(g1)) / iters, 1e-9)


def _ladder_iters(n, work_target, lo=8):
    """Chain iterations for a size-n op so total chained work is comparable
    to `work_target` elements — small sizes need MANY iterations or the
    measured delta drowns in fence jitter (a 4-iteration chain at n=131072
    is ~3.5 ms of work read through a ~30 ms noisy fence: round-1 recorded
    53 M keys/s there while direct timing showed ~150)."""
    return max(lo, min(131072, work_target // max(n, 1)))


def full_table(backend):
    """The reference's size ladder (README.md:100-133). Every row uses
    chained-iteration timing with a work-proportional iteration count
    (_ladder_iters): the tunnel fence is ~30 ms with multi-ms jitter, so
    even a 268M op (~15 ms) needs chaining to resolve cleanly."""
    sizes = [2**k for k in [10, 14, 16, 17, 19, 20, 24, 26, 27, 28]]
    big = 2**29  # chained timing everywhere: direct fenced timing is too
    # jittery through the ~30 ms tunnel fence even at 268M (a 15 ms op)
    print(f"# backend={backend or 'auto'} device={jax.devices()[0].device_kind}")
    print("## Reduce (u32 sum)")
    for n in sizes:
        if n < big:
            x = _rand_u32(n, 2)
            t = _chain_time(
                lambda s_: s_ + reduce(s_, ReduceOperator.SUM, backend=backend),
                x, _ladder_iters(n, 2**31),
            )
        else:
            t = bench_reduce(n, backend)
        print(f"{n:>12} {_fmt_ms(t)}  {n * 4 / t / 1e9:8.1f} GB/s read")
    print("## BlellochScan (u32 exclusive sum)")
    for n in sizes:
        if n < big:
            x = _rand_u32(n, 3)
            t = _chain_time(
                lambda s_: exclusive_scan(s_, backend=backend),
                x, _ladder_iters(n, 2**31),
            )
        else:
            t = bench_scan(n, backend)
        print(f"{n:>12} {_fmt_ms(t)}  {n * 4 / t / 1e9:8.1f} GB/s in-size")
    print("## RadixSort (u32 key+value, 8 passes)")
    for n in sizes:
        if n < big:
            k = _rand_u32(n, 1)
            v = jnp.arange(n, dtype=jnp.uint32)
            t = _chain_time(
                lambda kv: tuple(radix_sort(kv[0], kv[1], backend=backend)),
                (k, v), _ladder_iters(n, 2**24, lo=4),
            )
        else:
            t = bench_sort(n, backend)
        print(f"{n:>12} {_fmt_ms(t)}  {n / t / 1e6:8.1f} M keys/s")


def vs_xla_table(backend):
    """Head-to-head vs the PLATFORM's own primitives on the same chip —
    the first question a real TPU user asks of a sort library. Same
    chained-iteration methodology and the same size ladder as full_table:

      sort    : radix_sort (key+value)  vs  jax.lax.sort(num_keys=1, stable)
      argsort : radix_argsort           vs  jnp.argsort(stable) (+gather)
      scan    : exclusive_scan          vs  jnp.cumsum (exclusive via roll)
      reduce  : reduce(SUM)             vs  jnp.sum

    The XLA rows are exactly what a user writes without this library; the
    reference has no such table (it compares only against its own GPU,
    README.md:91-134)."""
    from glu_tpu import radix_argsort

    sizes = [2**k for k in [10, 14, 17, 20, 24, 26, 28]]
    print(f"# vs-xla backend={backend or 'auto'} device={jax.devices()[0].device_kind}")
    print("## Sort u32 key+value: glu radix_sort vs jax.lax.sort(num_keys=1, is_stable=True)")
    for n in sizes:
        k = _rand_u32(n, 1)
        v = jnp.arange(n, dtype=jnp.uint32)
        it = _ladder_iters(n, 2**24, lo=4)
        t_glu = _chain_time(
            lambda kv: tuple(radix_sort(kv[0], kv[1], backend=backend)), (k, v), it
        )
        t_xla = _chain_time(
            lambda kv: tuple(jax.lax.sort(kv, num_keys=1, is_stable=True)), (k, v), it
        )
        print(
            f"{n:>12} glu {_fmt_ms(t_glu)} ({n / t_glu / 1e6:8.1f} M keys/s)   "
            f"lax.sort {_fmt_ms(t_xla)} ({n / t_xla / 1e6:8.1f} M keys/s)   "
            f"speedup {t_xla / t_glu:5.2f}x"
        )
    print("## Argsort u32: glu radix_argsort vs jnp.argsort(stable)+gather")
    for n in sizes:
        k = _rand_u32(n, 2)
        it = _ladder_iters(n, 2**24, lo=4)
        t_glu = _chain_time(
            lambda kv: tuple(radix_argsort(kv[0], backend=backend)[:1]) + (kv[0],),
            (k, k), it,
        )

        def xla_argsort(kv):
            order = jnp.argsort(kv[0], stable=True)
            return (kv[0][order], kv[0])

        t_xla = _chain_time(xla_argsort, (k, k), it)
        print(
            f"{n:>12} glu {_fmt_ms(t_glu)} ({n / t_glu / 1e6:8.1f} M keys/s)   "
            f"argsort {_fmt_ms(t_xla)} ({n / t_xla / 1e6:8.1f} M keys/s)   "
            f"speedup {t_xla / t_glu:5.2f}x"
        )
    print("## Exclusive scan u32: glu exclusive_scan vs jnp.cumsum-roll")
    for n in sizes:
        x = _rand_u32(n, 3)
        it = _ladder_iters(n, 2**31)
        t_glu = _chain_time(lambda s_: exclusive_scan(s_, backend=backend), x, it)

        def xla_escan(s_):
            c = jnp.cumsum(s_, dtype=jnp.uint32)
            return jnp.concatenate([jnp.zeros((1,), jnp.uint32), c[:-1]])

        t_xla = _chain_time(xla_escan, x, it)
        print(
            f"{n:>12} glu {_fmt_ms(t_glu)} ({n * 4 / t_glu / 1e9:7.1f} GB/s)   "
            f"cumsum {_fmt_ms(t_xla)} ({n * 4 / t_xla / 1e9:7.1f} GB/s)   "
            f"speedup {t_xla / t_glu:5.2f}x"
        )
    print("## Reduce u32 sum: engine kernel vs jnp.sum vs routed default")
    print("#  (chained s+reduce(s) timing: measures the FUSED composition —")
    print("#  XLA folds the chain's elementwise add into its reducer, eliding")
    print("#  one HBM read/iter; standalone the two are both at HBM roofline,")
    print("#  proto/reduce_lab2.py. The routed default takes the platform.)")
    for n in sizes:
        x = _rand_u32(n, 4)
        it = _ladder_iters(n, 2**31)
        t_glu = _chain_time(
            lambda s_: s_ + reduce(s_, ReduceOperator.SUM, backend=backend), x, it
        )
        t_xla = _chain_time(lambda s_: s_ + jnp.sum(s_, dtype=jnp.uint32), x, it)
        t_routed = _chain_time(
            lambda s_: s_ + reduce(s_, ReduceOperator.SUM), x, it
        )
        print(
            f"{n:>12} engine {_fmt_ms(t_glu)} ({n * 4 / t_glu / 1e9:7.1f} GB/s)   "
            f"jnp.sum {_fmt_ms(t_xla)} ({n * 4 / t_xla / 1e9:7.1f} GB/s)   "
            f"routed {_fmt_ms(t_routed)}   "
            f"routed-vs-platform {t_xla / t_routed:5.2f}x"
        )


def bench_dist(n, backend, reps=2, capacity_factor=1.5, exchange="auto", pipeline_chunks="auto"):
    """Distributed sort throughput + scaling efficiency over all local
    devices (the BASELINE.json multi-host metric; on a pod slice run this
    per-host under jax.distributed)."""
    from glu_tpu.parallel import distributed_radix_sort, make_sort_mesh

    devices = jax.devices()
    d = len(devices)
    n = (n // d) * d
    keys = _rand_u32(n, 5)
    vals = jnp.arange(n, dtype=jnp.uint32)
    mesh = make_sort_mesh(devices)
    spec = jax.sharding.PartitionSpec("shards")
    sharding = jax.sharding.NamedSharding(mesh, spec)
    keys = jax.device_put(keys, sharding)
    vals = jax.device_put(vals, sharding)

    def run():
        return distributed_radix_sort(
            keys, vals, mesh, backend=backend, capacity_factor=capacity_factor,
            exchange=exchange, pipeline_chunks=pipeline_chunks,
        )

    _sync(run())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(run())
        best = min(best, time.perf_counter() - t0)

    single = bench_sort(n // d, backend, reps=reps)  # one-device reference
    eff = (n / best) / (d * (n // d) / single) if single > 0 else float("nan")
    print(
        json.dumps(
            {
                "metric": f"dist_sort_keys_per_sec_n{n}_d{d}",
                "value": round(n / best, 1),
                "unit": "keys/s",
                "devices": d,
                "exchange": exchange,
                "pipeline_chunks": pipeline_chunks,
                "scaling_efficiency_vs_1dev": round(eff, 3),
            }
        )
    )


def _make_dist_keys(n, dist, seed=9):
    if dist == "uniform":
        return _rand_u32(n, seed)
    if dist == "presorted":
        return jnp.arange(n, dtype=jnp.uint32)
    if dist == "reverse":
        # NOT jnp.arange(n, 0, -1): a negative-step arange materializes on
        # the HOST and the ~1 GB H2D transfer through the tunnel (~20 s)
        # lands inside the timed region — CHECK_r02/r03's "reverse flake"
        return jnp.uint32(n) - jnp.arange(n, dtype=jnp.uint32)
    if dist == "lowentropy":
        return _rand_u32(n, seed) % jnp.uint32(10)
    if dist == "zipf":
        # device-side zipf(s=1.3) equivalent via the Pareto inverse CDF:
        # survival P(X>k) ~ k^-(s-1), the same tail law np.random.zipf(1.3)
        # draws (the 1B dist artifact's distribution) without a 1 GB host
        # transfer through the tunnel. Heavy skew at EVERY digit level —
        # the north-star adversarial case for the splicer's long-run path.
        u = jax.random.uniform(
            jax.random.key(seed), (n,), jnp.float32, minval=2.0**-24, maxval=1.0
        )
        x = jnp.power(u, jnp.float32(-1.0 / 0.3))
        return jnp.minimum(x, jnp.float32(4.2949673e9)).astype(jnp.uint32)
    raise ValueError(dist)


@jax.jit
def _device_verify(in_keys, out_k, out_v):
    """Device-side sort verification for sizes too large to fetch through
    the tunnel: sortedness, permutation (sum/xor/sum-of-squares checksums
    mod 2^32), and stability (values ascending within equal-key runs, valid
    because the values are iota)."""
    sorted_ok = jnp.all(out_k[1:] >= out_k[:-1])

    def chks(x):
        # order-independent multiset checksums mod 2^32
        return (
            jnp.sum(x, dtype=jnp.uint32),
            jnp.sum(x * x, dtype=jnp.uint32),
            jnp.sum(x * jnp.uint32(0x9E3779B9) ^ (x >> 16), dtype=jnp.uint32),
        )

    perm_ok = jnp.all(jnp.array([a == b for a, b in zip(chks(in_keys), chks(out_k))]))
    vperm_ok = jnp.all(
        jnp.array(
            [
                a == b
                for a, b in zip(
                    chks(jnp.arange(in_keys.shape[0], dtype=jnp.uint32)), chks(out_v)
                )
            ]
        )
    )
    stable_ok = jnp.all(jnp.where(out_k[1:] == out_k[:-1], out_v[1:] > out_v[:-1], True))
    # pairing checksum: multiset of nonlinear (key, value) combines must match
    # the input's (key, iota) multiset — catches values swapped between
    # positions holding different keys, which the independent multiset checks
    # above would miss
    iota = jnp.arange(in_keys.shape[0], dtype=jnp.uint32)
    mix = lambda k, v: (k * jnp.uint32(0x9E3779B9)) ^ v
    pair_ok = jnp.all(
        jnp.array([a == b for a, b in zip(chks(mix(in_keys, iota)), chks(mix(out_k, out_v)))])
    )
    return sorted_ok & perm_ok & vperm_ok & stable_ok & pair_ok


def run_checks(n, backend, bits=None):
    """BASELINE.json config battery: 268M-scale sorts across uniform,
    pre-sorted, reverse, low-entropy, and zipf-skewed keys, verified
    on-device.

    One untimed warm-up sort + verify first: every distribution shares the
    same shapes, so this pays ALL compiles (sort program + verifier) before
    any timed row — CHECK_r02's first row famously read 30× below steady
    state because it ran cold. With bits=\"auto\" (the adaptive battery) each
    distribution compiles a DIFFERENT pass program, so every distribution
    gets its own untimed warm-up; the timed region still includes the
    varying-bit detection (one reduction + a ~30 ms tunnel fetch) — the
    price a real caller pays."""
    import numpy as np

    wk = _rand_u32(n, 11)
    wv = jnp.arange(n, dtype=jnp.uint32)
    ok_w, ov_w = radix_sort(jnp.copy(wk), wv, backend=backend, bits=bits)
    bool(np.asarray(_device_verify(wk, ok_w, ov_w)))
    del wk, wv, ok_w, ov_w

    for dist in ("uniform", "presorted", "reverse", "lowentropy", "zipf"):
        keys = _make_dist_keys(n, dist)
        vals = jnp.arange(n, dtype=jnp.uint32)
        if bits is not None:  # per-distribution pass program: warm it first
            ok_w, ov_w = radix_sort(jnp.copy(keys), jnp.copy(vals), backend=backend, bits=bits)
            bool(np.asarray(_device_verify(keys, ok_w, ov_w)))
            del ok_w, ov_w
        t0 = time.perf_counter()
        out_k, out_v = radix_sort(jnp.copy(keys), jnp.copy(vals), backend=backend, bits=bits)
        ok = bool(np.asarray(_device_verify(keys, out_k, out_v)))
        dt = time.perf_counter() - t0 - _fence_floor()
        rec = {"check": dist, "n": n, "ok": ok, "keys_per_s": round(n / dt, 1)}
        if bits is not None:
            rec["bits"] = bits
        print(json.dumps(rec))
        assert ok, f"device verification FAILED for {dist} at n={n}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=268_435_456)
    ap.add_argument("--backend", default=None, choices=[None, "pallas", "xla"])
    ap.add_argument("--table", action="store_true", help="print the full reference size ladder")
    ap.add_argument("--vs-xla", action="store_true",
                    help="head-to-head ladder vs the platform's own jax.lax.sort/"
                         "jnp.argsort/jnp.cumsum/jnp.sum on the same chip")
    ap.add_argument("--dist", action="store_true", help="distributed sort over all local devices")
    ap.add_argument("--exchange", default="auto", choices=["auto", "padded", "ragged"],
                    help="bucket exchange implementation for --dist (ragged = "
                         "jax.lax.ragged_all_to_all; compiles on TPU meshes only)")
    ap.add_argument("--pipeline-chunks", default="auto",
                    type=lambda v: v if v == "auto" else int(v),
                    help="chunked overlap pipeline for --dist (exchange of chunk c "
                         "overlaps partition of chunk c+1 on real meshes)")
    ap.add_argument("--keys-only", action="store_true",
                    help="benchmark radix_sort_keys (no value payload)")
    ap.add_argument("--segmented", type=int, default=0, metavar="S",
                    help="benchmark the variable-length segmented sort with S random segments")
    ap.add_argument("--u64", action="store_true",
                    help="benchmark the 64-bit key sort (radix_sort_u64_parts)")
    ap.add_argument("--check", action="store_true",
                    help="run the BASELINE config battery (uniform/presorted/reverse/lowentropy) with on-device verification")
    ap.add_argument("--adaptive", action="store_true",
                    help="sort with bits=\"auto\" (entropy-adaptive bit pruning; "
                         "detection cost included in the timed region)")
    ap.add_argument("--calibrate", action="store_true",
                    help="measure the router cost-model points on THIS chip and "
                         "write the calibration file (see ops/radix_sort.py::"
                         "_router_model); --quick-calibrate for a shorter ladder")
    ap.add_argument("--quick-calibrate", action="store_true",
                    help="--calibrate with a 2^26-capped ladder")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu-mesh", type=int, default=0, metavar="N",
                    help="force an N-virtual-device CPU mesh (the stand-in for "
                         "a pod slice when no multi-chip hardware is attached); "
                         "use with --dist to record scaling efficiency")
    args = ap.parse_args()

    if args.cpu_mesh:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
            ).strip()
        os.environ["GLU_TPU_PALLAS_INTERPRET"] = "1"  # pallas kernels on CPU
        jax.config.update("jax_platforms", "cpu")

    # keep None (auto) — the sort entry points route per (n, streams,
    # passes) between the radix engine and the platform sort (measured
    # crossovers in ops/radix_sort.py); an explicit --backend forces one.
    backend = args.backend and resolve_backend(args.backend)
    if args.calibrate or args.quick_calibrate:
        calibrate_router(quick=args.quick_calibrate)
        return
    if args.table:
        full_table(backend)
        return
    if args.vs_xla:
        vs_xla_table(backend)
        return
    if args.dist:
        bench_dist(args.n, backend, reps=args.reps, exchange=args.exchange,
                   pipeline_chunks=args.pipeline_chunks)
        return
    if args.check:
        run_checks(args.n, backend, bits="auto" if args.adaptive else None)
        return
    if args.segmented:
        bench_segmented(args.n, backend, num_segments=args.segmented, reps=args.reps)
        return
    if args.u64:
        bench_u64(args.n, backend, reps=args.reps)
        return

    if args.keys_only:
        n = args.n
        elapsed = bench_sort_keys(n, backend, reps=args.reps)
        # the reference has no keys-only mode (pairs are mandatory,
        # README.md:88-89); the ratio below divides by its KEY+VALUE rate and
        # is a cross-workload comparison — named accordingly, not vs_baseline
        print(
            json.dumps(
                {
                    "metric": f"radix_sort_keysonly_keys_per_sec_n{n}",
                    "value": round(n / elapsed, 1),
                    "unit": "keys/s",
                    "vs_kv_baseline": round(n / elapsed / BASELINE_SORT_268M_KEYS_PER_S, 3),
                }
            )
        )
        return

    n = args.n
    bits = "auto" if args.adaptive else None
    try:
        elapsed = bench_sort(n, backend, reps=args.reps, bits=bits)
    except Exception as e:  # noqa: BLE001 — bench must always emit its JSON line
        print(f"bench failure at n={n} backend={backend}: {e}", file=sys.stderr)
        n = 16_777_216
        elapsed = bench_sort(n, backend, reps=args.reps, bits=bits)
    keys_per_s = n / elapsed
    # normalize to the 268M-pair headline metric even when n differs
    tag = "_adaptive" if args.adaptive else ""
    print(
        json.dumps(
            {
                "metric": f"radix_sort_u32kv{tag}_keys_per_sec_n{n}",
                "value": round(keys_per_s, 1),
                "unit": "keys/s",
                "vs_baseline": round(keys_per_s / BASELINE_SORT_268M_KEYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
