"""Backend selection: "pallas" (TPU kernels) vs "xla" (portable jnp).

The reference specializes GLSL shaders at construction time
(glu/Reduce.hpp:68-99); our analog is choosing a compute backend per call and
letting jax.jit cache the specialization per (backend, dtype, shape).
"""

from __future__ import annotations

import os

import jax

from ..utils.errors import check_argument

_VALID = ("pallas", "xla")

# Environment override, mostly for benchmarking/debugging (the analog of the
# reference's GLU_VERBOSE-style compile-time switches, RadixSort.hpp:244-246).
_ENV_BACKEND = "GLU_TPU_BACKEND"


def is_tpu_backend() -> bool:
    """True when the default JAX device is a TPU (incl. tunneled platforms
    whose device_kind reports TPU)."""
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    return dev.platform == "tpu" or "TPU" in getattr(dev, "device_kind", "")


def resolve_backend(backend: str | None) -> str:
    """Resolve an explicit/env/auto backend choice."""
    if backend is None:
        backend = os.environ.get(_ENV_BACKEND) or ("pallas" if is_tpu_backend() else "xla")
    check_argument(backend in _VALID, "Invalid backend: %s (want one of %s)", backend, _VALID)
    return backend
