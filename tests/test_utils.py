"""Unit tests of the utility layer (reference has none in isolation — SURVEY
§4 notes all its tests are integration; host-logic unit tests are one of the
gaps our suite closes)."""

import jax.numpy as jnp
import numpy as np
import pytest

from glu_tpu import (
    DataType,
    DeviceBuffer,
    GluError,
    check_argument,
    copy_buffer,
    div_ceil,
    dtype_info,
    is_power_of_2,
    log32_ceil,
    log32_floor,
    next_power_of_2,
    to_type_str,
)
from glu_tpu.utils.errors import GluArgumentError
from glu_tpu.utils.timing import measure_elapsed_time, ns_to_human_string


def test_math_helpers():
    # semantics of reference gl_utils.hpp:267-302
    assert div_ceil(10, 3) == 4
    assert div_ceil(9, 3) == 3
    assert is_power_of_2(1) and is_power_of_2(1024) and not is_power_of_2(3)
    assert next_power_of_2(1) == 1
    assert next_power_of_2(5) == 8
    assert next_power_of_2(1024) == 1024
    assert log32_floor(32) == 1 and log32_floor(31) == 0
    assert log32_ceil(33) == 2 and log32_ceil(32) == 1
    assert log32_ceil(1024) == 2


def test_dtype_registry_all_12():
    # the 12 GLU element types, reference data_types.hpp:8-22
    names = {to_type_str(dt) for dt in DataType}
    assert names == {
        "float", "double", "int", "uint",
        "vec2", "vec4", "dvec2", "dvec4",
        "uvec2", "uvec4", "ivec2", "ivec4",
    }
    info = dtype_info(DataType.UVEC4)
    assert info.components == 4 and info.dtype == jnp.uint32
    assert dtype_info(DataType.FLOAT).element_shape() == ()
    assert dtype_info(DataType.VEC2).element_shape() == (2,)


def test_errors_raise():
    with pytest.raises(GluArgumentError):
        check_argument(False, "bad %d", 42)
    with pytest.raises(GluError):
        check_argument(False)


def test_device_buffer_roundtrip():
    # surface of reference ShaderStorageBuffer, gl_utils.hpp:146-246
    buf = DeviceBuffer(size=8, dtype=jnp.uint32)
    assert buf.size == 8
    buf.write_data(np.arange(8, dtype=np.uint32))
    np.testing.assert_array_equal(buf.get_data(), np.arange(8))
    buf.resize(16, keep_data=True)
    assert buf.size == 16
    np.testing.assert_array_equal(buf.get_data(8), np.arange(8))
    buf.clear(7)
    assert set(buf.get_data().tolist()) == {7}
    buf.resize(4, keep_data=False)
    np.testing.assert_array_equal(buf.get_data(), np.zeros(4))


def test_copy_buffer():
    src = jnp.arange(5, dtype=jnp.uint32)
    np.testing.assert_array_equal(np.asarray(copy_buffer(src)), np.arange(5))
    np.testing.assert_array_equal(np.asarray(copy_buffer(src, 3)), np.arange(3))
    np.testing.assert_array_equal(np.asarray(copy_buffer(src, 7)), [0, 1, 2, 3, 4, 0, 0])


def test_timing():
    ns, result = measure_elapsed_time(lambda: jnp.arange(10).sum())
    assert ns > 0 and int(result) == 45
    assert ns_to_human_string(1.5e9) == "1.500 s"
    assert ns_to_human_string(2.5e6) == "2.500 ms"
    assert ns_to_human_string(500) == "500 ns"
