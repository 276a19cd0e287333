"""Distributed sort tests on the 8-virtual-device CPU mesh (SURVEY.md §4:
the xla_force_host_platform_device_count trick makes multi-device logic
testable without a pod)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glu_tpu.parallel import distributed_radix_sort, make_sort_mesh


def _global_result(out_k, out_v, counts, num_devices):
    """Concatenate the real prefix of every shard in device order."""
    out_k, out_v, counts = np.asarray(out_k), np.asarray(out_v), np.asarray(counts)
    per = out_k.shape[0] // num_devices
    ks, vs = [], []
    for d in range(num_devices):
        c = int(counts[d])
        ks.append(np.asarray(out_k[d * per : d * per + c]))
        vs.append(np.asarray(out_v[d * per : d * per + c]))
    return np.concatenate(ks), np.concatenate(vs)


def _run(keys: np.ndarray, num_devices=8, **kw):
    mesh = make_sort_mesh(jax.devices()[:num_devices])
    vals = np.arange(keys.size, dtype=np.uint32)
    spec = jax.sharding.PartitionSpec("shards")
    sharding = jax.sharding.NamedSharding(mesh, spec)
    k = jax.device_put(jnp.asarray(keys), sharding)
    v = jax.device_put(jnp.asarray(vals), sharding)
    out_k, out_v, counts, overflow = distributed_radix_sort(k, v, mesh, backend="xla", **kw)
    assert int(np.asarray(overflow)[0]) == 0, "capacity overflow"
    gk, gv = _global_result(out_k, out_v, np.asarray(counts), num_devices)
    assert gk.size == keys.size
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(gk, keys[order])
    np.testing.assert_array_equal(gv, order.astype(np.uint32))


def test_dist_sort_uniform(seeded_rng):
    rng = seeded_rng(1)
    _run(rng.sample_int_vector(8 * 2048, 0, 0xFFFFFFFE))


def test_dist_sort_low_entropy(seeded_rng):
    # duplicate-heavy: stresses cross-device stability of ties
    rng = seeded_rng(2)
    _run(rng.sample_int_vector(8 * 1024, 0, 9), capacity_factor=16.0)


def test_dist_sort_skewed(seeded_rng):
    # BASELINE.json config: skewed key distribution — sampled splitters must
    # adapt; zipf-ish mass on tiny keys
    rng = seeded_rng(3)
    n = 8 * 2048
    z = rng.rng.zipf(1.3, size=n).astype(np.uint32)
    _run(z, capacity_factor=4.0)


def test_dist_sort_presorted_and_reverse():
    # range-correlated inputs concentrate each shard into one destination
    # block: the padded exchange needs per-block capacity = local shard size
    # (capacity_factor = D). On real pods the "ragged" exchange handles this
    # with factor ~1; XLA:CPU has no ragged-all-to-all to test against.
    n = 8 * 1024
    _run(np.arange(n, dtype=np.uint32), capacity_factor=8.0)
    _run(np.arange(n, dtype=np.uint32)[::-1].copy(), capacity_factor=8.0)


def test_dist_sort_max_keys(seeded_rng):
    # real 0xFFFFFFFF keys must not be confused with padding
    rng = seeded_rng(4)
    keys = rng.sample_int_vector(8 * 512, 0xFFFFFFF0, 0xFFFFFFFF)
    _run(keys, capacity_factor=16.0)


def test_dist_sort_two_devices(seeded_rng):
    rng = seeded_rng(5)
    _run(rng.sample_int_vector(2 * 4096, 0, 1 << 20), num_devices=2)


def test_graft_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    assert jax.jit(fn).lower(*args).compile() is not None


def test_graft_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
