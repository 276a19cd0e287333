"""Native (C++) host components — see oracle.py."""

from .oracle import NativeOracle, get_oracle, have_native
