"""Verbose logging gate.

Analog of the reference's GLU_VERBOSE compile-time flag, which gates
scratch-buffer realloc logs (reference glu/RadixSort.hpp:244-268 — its TODO
at :244 admits the missing log utility). Here a runtime env var
(GLU_TPU_VERBOSE=1) gates stderr diagnostics: block-size selection, pass
layout, splice run counts.
"""

from __future__ import annotations

import os
import sys


def verbose_enabled() -> bool:
    return os.environ.get("GLU_TPU_VERBOSE", "0") == "1"


def vlog(fmt: str, *args) -> None:
    """Print a diagnostic line to stderr when GLU_TPU_VERBOSE=1."""
    if verbose_enabled():
        print("glu_tpu: " + (fmt % args if args else fmt), file=sys.stderr)
