"""Test fixture layer.

The reference's fixture is a hidden GLFW window providing one shared GL 4.6
context (test/main.cpp:64-89). Ours is a JAX CPU platform with 8 virtual
devices — so single-chip ops AND the multi-chip sharded paths are testable
without a TPU pod (SURVEY.md §4: xla_force_host_platform_device_count) — and
x64 enabled so DataType.DOUBLE/DVEC* are exercisable like the reference's
double/dvec2/dvec4 test sections (test/reduce_tests.cpp:54-145).

Set GLU_TPU_TEST_PLATFORM=tpu to run the suite against a real chip instead.
"""

import os

_plat = os.environ.get("GLU_TPU_TEST_PLATFORM", "cpu")
if _plat == "cpu":
    # The environment's sitecustomize may pre-import jax with a TPU plugin
    # (JAX_PLATFORMS=axon); env vars alone are too late, so force the
    # platform through jax.config before any backend initializes.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

if _plat == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", os.environ.get("JAX_ENABLE_X64", "0") == "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


class SeededRandom:
    """Seeded RNG mirroring the reference's test/util/Random.hpp:15-38
    (minstd_rand + modulo sampling). We use PCG64 — the *seeding discipline*
    (fixed seeds per case) is what matters for reproducibility, not the
    generator family."""

    def __init__(self, seed: int = 0):
        self.rng = np.random.Generator(np.random.PCG64(seed))

    def sample_int_vector(self, count: int, min_v: int, max_v: int) -> np.ndarray:
        """Uniform u32 samples in [min_v, max_v] (reference Random.hpp:29-37)."""
        return self.rng.integers(min_v, max_v + 1, size=count, dtype=np.uint32)

    def sample_float_vector(self, count: int, min_v: float, max_v: float) -> np.ndarray:
        return self.rng.uniform(min_v, max_v, size=count).astype(np.float32)


@pytest.fixture
def seeded_rng():
    return SeededRandom


@pytest.fixture(params=["xla", "pallas-interpret"])
def backend(request, monkeypatch):
    """Run each op test against the portable XLA backend and the Pallas
    kernels in interpreter mode (the TPU-kernel logic checker — SURVEY.md §5:
    'interpret mode is the analog checker')."""
    if request.param == "pallas-interpret":
        monkeypatch.setenv("GLU_TPU_PALLAS_INTERPRET", "1")
        return "pallas"
    return "xla"
