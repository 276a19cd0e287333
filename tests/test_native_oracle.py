"""Native C++ oracle tests: the oracle must agree with NumPy references
(it is itself used to verify large device results, so it gets its own
verification here — oracle-of-the-oracle)."""

import numpy as np
import pytest

from glu_tpu.native import get_oracle, have_native


@pytest.fixture(scope="module")
def oracle():
    return get_oracle()


def test_native_lib_builds(oracle):
    # g++ is part of the supported toolchain; the numpy fallback exists for
    # degraded environments but we assert the native path here
    assert have_native(), "native oracle failed to build/load"


def test_oracle_sort(oracle, seeded_rng):
    rng = seeded_rng(1)
    k = rng.sample_int_vector(100_000, 0, 0xFFFFFFFE)
    v = np.arange(k.size, dtype=np.uint32)
    ok, ov = oracle.radix_sort_kv(k, v)
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(ok, k[order])
    np.testing.assert_array_equal(ov, order.astype(np.uint32))


def test_oracle_sort_partial(oracle, seeded_rng):
    rng = seeded_rng(2)
    k = rng.sample_int_vector(50_000, 0, 0xFFFFFFFE)
    v = np.arange(k.size, dtype=np.uint32)
    ok, ov = oracle.radix_sort_kv(k, v, num_steps=3)
    order = np.argsort(k & np.uint32(0xFFF), kind="stable")
    np.testing.assert_array_equal(ok, k[order])
    np.testing.assert_array_equal(ov, order.astype(np.uint32))


def test_oracle_sort_duplicates(oracle, seeded_rng):
    rng = seeded_rng(3)
    k = rng.sample_int_vector(10_000, 0, 5)
    v = np.arange(k.size, dtype=np.uint32)
    ok, ov = oracle.radix_sort_kv(k, v)
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(ov, order.astype(np.uint32))
    assert oracle.is_sorted(ok)


def test_oracle_scan(oracle, seeded_rng):
    rng = seeded_rng(4)
    x = rng.sample_int_vector(4096, 0, 0xFFFFFFFE)  # large values: wraps mod 2^32
    got = oracle.exclusive_scan(x, num_partitions=4)
    seg = x.reshape(4, 1024)
    inc = np.cumsum(seg, axis=1, dtype=np.uint32)
    np.testing.assert_array_equal(got, (inc - seg).reshape(-1))


def test_oracle_reduce(oracle, seeded_rng):
    rng = seeded_rng(5)
    x = rng.sample_int_vector(100_001, 0, 0xFFFFFFFE)
    assert oracle.reduce_u32(x, "sum") == np.uint32(x.sum(dtype=np.uint32))
    assert oracle.reduce_u32(x, "min") == x.min()
    assert oracle.reduce_u32(x, "max") == x.max()
    small = rng.sample_int_vector(64, 1, 3)
    assert oracle.reduce_u32(small, "mul") == np.uint32(np.prod(small, dtype=np.uint32))


@pytest.mark.parametrize("op", ["sum", "mul", "min", "max"])
def test_oracle_scan_op(oracle, op, seeded_rng):
    rng = seeded_rng(6)
    x = rng.sample_int_vector(8192, 0, 0xFFFFFFFE)
    if op == "mul":
        x = (x | 1).astype(np.uint32)
    got = oracle.exclusive_scan_op(x, num_partitions=4, op=op)
    ufuncs = {"sum": np.add, "mul": np.multiply, "min": np.minimum, "max": np.maximum}
    idents = {"sum": 0, "mul": 1, "min": 0xFFFFFFFF, "max": 0}
    seg = x.reshape(4, 2048)
    inc = ufuncs[op].accumulate(seg, axis=1).astype(np.uint32)
    first = np.full((4, 1), idents[op], np.uint32)
    np.testing.assert_array_equal(
        got, np.concatenate([first, inc[:, :-1]], axis=1).reshape(-1)
    )


def test_oracle_sort_u64(oracle, seeded_rng):
    rng = seeded_rng(7)
    n = 50_000
    hi = rng.sample_int_vector(n, 0, 7)  # few hi values: lo must break ties
    lo = rng.sample_int_vector(n, 0, 0xFFFFFFFE)
    v = np.arange(n, dtype=np.uint32)
    oh, ol, ov = oracle.radix_sort_u64_parts(hi, lo, v)
    k64 = (hi.astype(np.uint64) << 32) | lo.astype(np.uint64)
    order = np.argsort(k64, kind="stable")
    np.testing.assert_array_equal(oh, hi[order])
    np.testing.assert_array_equal(ol, lo[order])
    np.testing.assert_array_equal(ov, order.astype(np.uint32))


def test_oracle_is_sorted(oracle):
    assert oracle.is_sorted(np.arange(100, dtype=np.uint32))
    assert not oracle.is_sorted(np.array([3, 1, 2], dtype=np.uint32))


def test_corrupt_lib_rebuilds(tmp_path, monkeypatch):
    """A cached .so from another machine/toolchain can exist (with a fresh
    mtime) yet refuse to CDLL — the loader must rebuild for THIS machine
    instead of silently dropping to the NumPy fallback."""
    import os

    from glu_tpu.native import oracle as om

    bad = tmp_path / "libgluoracle.so"
    bad.write_bytes(b"\x7fELF not really")
    fresh = om._SRC.stat().st_mtime + 100
    os.utime(bad, (fresh, fresh))
    monkeypatch.setattr(om, "_LIB", bad)
    monkeypatch.setattr(om, "_lib", None)
    monkeypatch.setattr(om, "_tried", False)
    assert om.have_native(), "loader must rebuild a corrupt cached library"
