"""Auto-dispatch router decision table (ops/radix_sort.py::_sort_backend).

The router is a pure function of (n, payload streams, passes) plus the
TPU/explicit-backend gates; these tests pin the measured crossovers
(VS_XLA_r04.txt) so a future cost-model edit that silently flips the
268M headline onto the slower path fails CI.
"""

import importlib
import json

import pytest

# `glu_tpu.ops.radix_sort` the module is shadowed by the re-exported
# function of the same name; resolve the module itself
rs = importlib.import_module("glu_tpu.ops.radix_sort")


@pytest.fixture
def on_tpu(monkeypatch):
    from glu_tpu.ops import backend as be

    monkeypatch.setattr(be, "is_tpu_backend", lambda: True)
    monkeypatch.delenv("GLU_TPU_BACKEND", raising=False)


def test_full_width_kv_crossover(on_tpu):
    # platform sort wins small/mid; the engine wins the 268M headline
    assert rs._sort_backend(None, 2**14, 1, 8) == "xla"
    assert rs._sort_backend(None, 2**20, 1, 8) == "xla"
    assert rs._sort_backend(None, 2**27, 1, 8) == "xla"
    assert rs._sort_backend(None, 2**28, 1, 8) == "pallas"
    assert rs._sort_backend(None, 2**29, 1, 8) == "pallas"


def test_keys_only_stays_platform(on_tpu):
    # 1-operand lax.sort beats the engine at every measured size
    for lg in (14, 20, 24, 28, 29):
        assert rs._sort_backend(None, 2**lg, 0, 8) == "xla"


def test_pruned_bits_favor_engine(on_tpu):
    # lax.sort cannot exploit lost entropy; few-pass sorts go to the engine
    assert rs._sort_backend(None, 2**24, 1, 1) == "pallas"
    assert rs._sort_backend(None, 2**28, 1, 2) == "pallas"
    # but tiny inputs still ride the platform's low dispatch latency
    assert rs._sort_backend(None, 2**10, 1, 1) == "xla"


def test_explicit_choice_and_env_win(on_tpu, monkeypatch):
    assert rs._sort_backend("pallas", 2**14, 1, 8) == "pallas"
    assert rs._sort_backend("xla", 2**28, 1, 8) == "xla"
    monkeypatch.setenv("GLU_TPU_BACKEND", "pallas")
    assert rs._sort_backend(None, 2**14, 1, 8) == "pallas"


def test_off_tpu_resolves_portably(monkeypatch):
    from glu_tpu.ops import backend as be

    monkeypatch.setattr(be, "is_tpu_backend", lambda: False)
    monkeypatch.delenv("GLU_TPU_BACKEND", raising=False)
    assert rs._sort_backend(None, 2**28, 1, 8) == "xla"


def test_multi_stream_crossover(on_tpu):
    # 3-operand sorts cross earlier than key+value (measured 5.02 vs ~6.1
    # ns/key at 67M, ~parity at 268M favoring the engine)
    assert rs._sort_backend(None, 2**24, 2, 8) == "xla"
    assert rs._sort_backend(None, 2**28, 2, 8) == "pallas"


def test_reduce_routes_to_platform_on_tpu(on_tpu, monkeypatch):
    """Round-5 router: reduce defaults to the platform on TPU (both sides
    are at HBM roofline standalone; the platform additionally fuses into
    neighboring elementwise passes — proto/reduce_lab2.py)."""
    rd = importlib.import_module("glu_tpu.ops.reduce")

    assert rd._reduce_backend(None) == "xla"
    assert rd._reduce_backend("pallas") == "pallas"
    monkeypatch.setenv("GLU_TPU_BACKEND", "pallas")
    assert rd._reduce_backend(None) == "pallas"


def test_reduce_router_off_tpu(monkeypatch):
    from glu_tpu.ops import backend as be

    rd = importlib.import_module("glu_tpu.ops.reduce")
    monkeypatch.setattr(be, "is_tpu_backend", lambda: False)
    monkeypatch.delenv("GLU_TPU_BACKEND", raising=False)
    assert rd._reduce_backend(None) == "xla"


def test_routed_end_to_end_on_tpu(seeded_rng):
    """Real-chip drive of BOTH routed paths (the CPU suite never routes —
    is_tpu_backend() is false there). Runs only under
    GLU_TPU_TEST_PLATFORM=tpu (the on-chip suite)."""
    import os

    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("GLU_TPU_TEST_PLATFORM") != "tpu":
        pytest.skip("routed paths engage on the real TPU only")
    from glu_tpu import radix_sort

    rng = seeded_rng(91)
    n = 1 << 20
    k = rng.sample_int_vector(n, 0, 2**32 - 1)
    v = np.arange(n, dtype=np.uint32)
    order = np.argsort(k, kind="stable")
    # full-width at 1M routes to the platform sort
    ok, ov = radix_sort(jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_array_equal(np.asarray(ok), k[order])
    np.testing.assert_array_equal(np.asarray(ov), order.astype(np.uint32))
    # pruned-bit at 1M routes to the engine
    kl = (k % np.uint32(1 << 8)).astype(np.uint32)
    order_l = np.argsort(kl, kind="stable")
    ok2, ov2 = radix_sort(jnp.asarray(kl), jnp.asarray(v), bits="auto")
    np.testing.assert_array_equal(np.asarray(ok2), kl[order_l])
    np.testing.assert_array_equal(np.asarray(ov2), order_l.astype(np.uint32))


def test_router_calibration_file(on_tpu, monkeypatch, tmp_path):
    """Round-5 self-calibration: a calibration file pointed to by
    GLU_TPU_ROUTER_CALIBRATION replaces the baked v5e constants; a missing
    or corrupt file falls back to them (one-time vlog warning)."""
    # fake chip where the platform sort is catastrophically slow: the router
    # must flip the 1M full-width kv sort (xla on the v5e table) to pallas
    fake = {
        "device": "TPU vTEST",
        "lax_ns_per_key": [[10, 500.0], [28, 500.0]],
        "lax_slope": 0.0,
    }
    p = tmp_path / "router.json"
    p.write_text(json.dumps(fake))
    monkeypatch.setenv("GLU_TPU_ROUTER_CALIBRATION", str(p))
    rs._reset_router_model()
    try:
        assert rs.router_calibration_path() == str(p)
        assert rs._router_model()["device"] == "TPU vTEST"
        assert rs._sort_backend(None, 2**20, 1, 8) == "pallas"
        # corrupt file: fall back to the baked table
        p.write_text("{nope")
        rs._reset_router_model()
        assert rs._router_model()["device"].startswith("TPU v5e")
        assert rs._sort_backend(None, 2**20, 1, 8) == "xla"
        # missing file: same fallback
        monkeypatch.setenv("GLU_TPU_ROUTER_CALIBRATION", str(tmp_path / "absent.json"))
        rs._reset_router_model()
        assert rs._sort_backend(None, 2**28, 1, 8) == "pallas"
    finally:
        rs._reset_router_model()


def test_router_model_default_cached(monkeypatch, tmp_path):
    monkeypatch.setenv("GLU_TPU_ROUTER_CALIBRATION", str(tmp_path / "none.json"))
    rs._reset_router_model()
    try:
        m1 = rs._router_model()
        m2 = rs._router_model()
        assert m1 is m2  # cached after first load
    finally:
        rs._reset_router_model()


def test_nonpow2_cliff_routes_to_engine(on_tpu):
    """Round-5: XLA's TPU sort has a pow-2-only fast path (measured +31%
    at 2^27+2^20); the router's lax model carries the cliff factor, so
    non-pow2 full-width kv sorts flip to the flat-rate engine from ~2^26
    up while exact pow-2 sizes keep the platform until ~2^27.5."""
    assert rs._sort_backend(None, 2**27, 1, 8) == "xla"        # pow2: platform
    assert rs._sort_backend(None, 2**27 + 2**20, 1, 8) == "pallas"  # cliff
    assert rs._sort_backend(None, int(1.05 * 2**27), 1, 8) == "pallas"
    assert rs._sort_backend(None, 2**24 + 1, 1, 8) == "xla"    # small: platform
