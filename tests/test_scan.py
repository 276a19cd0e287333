"""Blelloch scan tests — mirrors reference test/blelloch_scan_tests.cpp
(exclusive_scan oracle, exact equality, partition batches) plus gaps: non-
power-of-2 lengths (functional form), u32 wraparound, int dtype."""

import jax.numpy as jnp
import numpy as np
import pytest

from glu_tpu import BlellochScan, DataType, DeviceBuffer, exclusive_scan
from glu_tpu.utils.errors import GluArgumentError


def _oracle(x: np.ndarray, num_partitions: int = 1) -> np.ndarray:
    part = x.size // num_partitions
    seg = x.reshape(num_partitions, part)
    inc = np.cumsum(seg, axis=1, dtype=x.dtype)
    return (inc - seg).reshape(x.size)


@pytest.mark.parametrize("size", [1024, 4096, 65536, 1 << 20])
def test_scan_multiple_sizes(size, backend, seeded_rng):
    # analog of BlellochScan-multiple-sizes (reference blelloch_scan_tests.cpp:28-46):
    # power-of-2 sizes 1K..1M, exact (bitwise) equality
    rng = seeded_rng(size)
    data = rng.sample_int_vector(size, 0, 1000)
    got = np.asarray(exclusive_scan(jnp.asarray(data), backend=backend))
    np.testing.assert_array_equal(got, _oracle(data))


@pytest.mark.parametrize("num_partitions", [1, 32, 100, 1000])
def test_scan_multiple_partitions(num_partitions, backend, seeded_rng):
    # analog of BlellochScan-multiple-partitions (blelloch_scan_tests.cpp:48-82):
    # 1024-element partitions scanned independently in one batched call
    part = 1024
    rng = seeded_rng(num_partitions)
    data = rng.sample_int_vector(part * num_partitions, 0, 100)
    got = np.asarray(exclusive_scan(jnp.asarray(data), num_partitions, backend=backend))
    np.testing.assert_array_equal(got, _oracle(data, num_partitions))


@pytest.mark.parametrize("size", [1, 5, 100, 1000, 12345, 99999])
def test_scan_non_power_of_2(size, backend, seeded_rng):
    # the reference requires power-of-2 (BlellochScan.hpp:134, with a TODO to
    # lift it) — the functional form lifts it; verify padding never leaks
    rng = seeded_rng(size)
    data = rng.sample_int_vector(size, 0, 1000)
    got = np.asarray(exclusive_scan(jnp.asarray(data), backend=backend))
    np.testing.assert_array_equal(got, _oracle(data))


def test_scan_wraps_mod_2_32(backend):
    data = np.full(1024, 0x80000001, dtype=np.uint32)
    got = np.asarray(exclusive_scan(jnp.asarray(data), backend=backend))
    np.testing.assert_array_equal(got, _oracle(data))


def test_scan_int32(backend):
    data = np.array([3, -1, 4, -1, 5, -9, 2, 6] * 4, dtype=np.int32)
    got = np.asarray(exclusive_scan(jnp.asarray(data), backend=backend))
    np.testing.assert_array_equal(got, _oracle(data))


def test_scan_class_requires_power_of_2():
    # parity with reference check at BlellochScan.hpp:134
    scan = BlellochScan(DataType.UINT)
    buf = DeviceBuffer(np.arange(100, dtype=np.uint32))
    with pytest.raises(GluArgumentError):
        scan(buf, 100)


def test_scan_class_in_place(backend):
    scan = BlellochScan(DataType.UINT)
    data = np.arange(1, 17, dtype=np.uint32)
    buf = DeviceBuffer(data)
    scan(buf, 16, backend=backend)
    np.testing.assert_array_equal(buf.get_data(), _oracle(data))


def test_scan_class_partitions_subset(backend):
    # scanning count*num_partitions elements of a larger buffer, as
    # RadixSort does with its [16][num_blocks_pow2] table (RadixSort.hpp:311)
    scan = BlellochScan(DataType.UINT)
    data = np.arange(64, dtype=np.uint32)
    buf = DeviceBuffer(data)
    scan(buf, 8, 4, backend=backend)  # scans first 32 elements as 4 partitions of 8
    np.testing.assert_array_equal(buf.get_data()[:32], _oracle(data[:32], 4))
    np.testing.assert_array_equal(buf.get_data()[32:], data[32:])
