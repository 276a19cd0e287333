"""ctypes loader for the native C++ oracle (oracle.cpp).

Compiles libgluoracle.so on first use with g++ (cached next to the source);
falls back to NumPy implementations when no compiler is available, so the
package never hard-depends on a toolchain. The native path verifies
268M-pair device results in seconds instead of minutes.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "oracle.cpp"
_LIB = _DIR / "libgluoracle.so"

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        # a cached .so from another machine/toolchain (e.g. -march=native
        # for a different CPU, or a different glibc) can exist yet refuse
        # to load — rebuild once for THIS machine and retry
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.glu_oracle_radix_sort_kv.argtypes = [u32p, u32p, ctypes.c_uint64]
    lib.glu_oracle_radix_sort_kv_partial.argtypes = [u32p, u32p, ctypes.c_uint64, ctypes.c_int]
    lib.glu_oracle_exclusive_scan.argtypes = [u32p, u32p, ctypes.c_uint64, ctypes.c_uint64]
    lib.glu_oracle_reduce_u32.argtypes = [u32p, ctypes.c_uint64, ctypes.c_int]
    lib.glu_oracle_reduce_u32.restype = ctypes.c_uint32
    lib.glu_oracle_is_sorted.argtypes = [u32p, ctypes.c_uint64]
    lib.glu_oracle_is_sorted.restype = ctypes.c_int
    lib.glu_oracle_exclusive_scan_op.argtypes = [
        u32p, u32p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int,
    ]
    lib.glu_oracle_radix_sort_u64.argtypes = [u32p, u32p, u32p, ctypes.c_uint64]
    _lib = lib
    return lib


def have_native() -> bool:
    return _load() is not None


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


class NativeOracle:
    """Host oracle: native C++ when available, NumPy otherwise."""

    def __init__(self):
        self.lib = _load()

    def radix_sort_kv(self, keys: np.ndarray, vals: np.ndarray, num_steps: int = 8):
        """Stable sort of u32 pairs by the low 4*num_steps key bits.
        Returns new arrays."""
        k = np.ascontiguousarray(keys, dtype=np.uint32).copy()
        v = np.ascontiguousarray(vals, dtype=np.uint32).copy()
        if self.lib is not None:
            if num_steps >= 8:
                self.lib.glu_oracle_radix_sort_kv(_p(k), _p(v), k.size)
            else:
                self.lib.glu_oracle_radix_sort_kv_partial(_p(k), _p(v), k.size, num_steps)
            return k, v
        mask = np.uint32(0xFFFFFFFF) if num_steps >= 8 else np.uint32((1 << (4 * num_steps)) - 1)
        order = np.argsort(keys & mask, kind="stable")
        return keys[order].astype(np.uint32), vals[order].astype(np.uint32)

    def exclusive_scan(self, data: np.ndarray, num_partitions: int = 1) -> np.ndarray:
        x = np.ascontiguousarray(data, dtype=np.uint32)
        if self.lib is not None:
            out = np.empty_like(x)
            self.lib.glu_oracle_exclusive_scan(_p(x), _p(out), x.size, num_partitions)
            return out
        part = x.size // num_partitions
        seg = x.reshape(num_partitions, part)
        inc = np.cumsum(seg, axis=1, dtype=np.uint32)
        return (inc - seg).reshape(x.size)

    def reduce_u32(self, data: np.ndarray, op: str) -> np.uint32:
        x = np.ascontiguousarray(data, dtype=np.uint32)
        ops = {"sum": 0, "mul": 1, "min": 2, "max": 3}
        if self.lib is not None:
            return np.uint32(self.lib.glu_oracle_reduce_u32(_p(x), x.size, ops[op]))
        fns = {"sum": np.sum, "mul": np.prod, "min": np.min, "max": np.max}
        return np.uint32(fns[op](x, dtype=np.uint32) if op in ("sum", "mul") else fns[op](x))

    def is_sorted(self, data: np.ndarray) -> bool:
        x = np.ascontiguousarray(data, dtype=np.uint32)
        if self.lib is not None:
            return bool(self.lib.glu_oracle_is_sorted(_p(x), x.size))
        return bool(np.all(x[:-1] <= x[1:]))

    def exclusive_scan_op(
        self, data: np.ndarray, num_partitions: int = 1, op: str = "sum"
    ) -> np.ndarray:
        """Exclusive prefix scan under sum/mul/min/max (the scan's operator
        generalization; the reference hardcodes `+`)."""
        x = np.ascontiguousarray(data, dtype=np.uint32)
        ops = {"sum": 0, "mul": 1, "min": 2, "max": 3}
        if self.lib is not None:
            out = np.empty_like(x)
            self.lib.glu_oracle_exclusive_scan_op(
                _p(x), _p(out), x.size, num_partitions, ops[op]
            )
            return out
        ufuncs = {"sum": np.add, "mul": np.multiply, "min": np.minimum, "max": np.maximum}
        idents = {"sum": 0, "mul": 1, "min": 0xFFFFFFFF, "max": 0}
        seg = x.reshape(num_partitions, x.size // num_partitions)
        inc = ufuncs[op].accumulate(seg, axis=1).astype(np.uint32)
        first = np.full((num_partitions, 1), idents[op], np.uint32)
        return np.concatenate([first, inc[:, :-1]], axis=1).reshape(x.size)

    def radix_sort_u64_parts(self, hi: np.ndarray, lo: np.ndarray, vals: np.ndarray):
        """Stable sort by 64-bit (hi, lo) keys with u32 values. Returns new
        arrays (hi, lo, vals)."""
        h = np.ascontiguousarray(hi, dtype=np.uint32).copy()
        l = np.ascontiguousarray(lo, dtype=np.uint32).copy()
        v = np.ascontiguousarray(vals, dtype=np.uint32).copy()
        if self.lib is not None:
            self.lib.glu_oracle_radix_sort_u64(_p(h), _p(l), _p(v), h.size)
            return h, l, v
        k64 = (hi.astype(np.uint64) << 32) | lo.astype(np.uint64)
        order = np.argsort(k64, kind="stable")
        return (
            hi[order].astype(np.uint32),
            lo[order].astype(np.uint32),
            vals[order].astype(np.uint32),
        )


_singleton: NativeOracle | None = None


def get_oracle() -> NativeOracle:
    global _singleton
    if _singleton is None:
        _singleton = NativeOracle()
    return _singleton
