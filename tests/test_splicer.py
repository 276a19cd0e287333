"""Multi-block splicer coverage (interpret mode).

The general large-N sort path — per-pass `_group_pass` + `_run_descriptors`
+ the hand-scheduled DMA splice kernel (semaphore pipelining, carry
rows, slack-region over-writes) — never triggers at suite-sized inputs with
the production geometry (BLOCK_R=1024 ⇒ one block below 131K elements).
These tests shrink the engine geometry so every splicer path runs in CI at
n≈2-8K: ≥3 blocks, misaligned run boundaries (carry row), empty runs (dummy
transfers), runs longer than CH_ROWS (nchunks>1 serial path), and the
R=BLOCK_R single-block per-pass route. Oracle: numpy stable argsort, so any
perturbation of the carry/boundary/pipelining logic fails the suite.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from glu_tpu import radix_sort, radix_sort_keys, radix_sort_multi


@pytest.fixture
def tiny_engine(monkeypatch):
    """Shrink the Pallas sort geometry: 16-row (2048-element) blocks, 8-row
    splice chunks, 16-row reads. Forces multi-block group+splice at tiny n.
    The host jit caches are keyed on shapes only, so stale traces from other
    tests (default geometry) must be dropped on entry and exit."""
    import importlib

    from glu_tpu.ops import _pallas_sort as ps

    # `glu_tpu.ops.radix_sort` the module is shadowed by the re-exported
    # function of the same name; resolve the module itself
    rs = importlib.import_module("glu_tpu.ops.radix_sort")

    monkeypatch.setenv("GLU_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(ps, "BLOCK_R", 16)
    monkeypatch.setattr(ps, "CH_ROWS", 8)
    monkeypatch.setattr(ps, "_READ_ROWS", 16)
    rs._radix_sort_streams.clear_cache()
    yield ps
    rs._radix_sort_streams.clear_cache()


def _check(keys: np.ndarray, num_steps: int = 0):
    vals = np.arange(keys.size, dtype=np.uint32)
    out_k, out_v = radix_sort(
        jnp.asarray(keys), jnp.asarray(vals), num_steps, backend="pallas"
    )
    mask = np.uint32(0xFFFFFFFF if num_steps == 0 else (1 << (4 * num_steps)) - 1)
    order = np.argsort(keys & mask, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), keys[order])
    np.testing.assert_array_equal(np.asarray(out_v), order.astype(np.uint32))


@pytest.mark.parametrize("size", [4100, 6000, 8192])
def test_multiblock_random(size, tiny_engine, seeded_rng):
    # 3-4 blocks of full-range keys: ~128-element runs land on arbitrary lane
    # offsets, so nearly every splice crosses a misaligned boundary (carry row)
    keys = seeded_rng(size).sample_int_vector(size, 0, 0xFFFFFFFE)
    _check(keys)


@pytest.mark.parametrize("lo_vals", [1, 2, 3])
def test_multiblock_long_and_empty_runs(lo_vals, tiny_engine, seeded_rng):
    # keys drawn from {0..lo_vals-1}: pass 0 leaves 16-lo_vals digits EMPTY
    # per block (dummy transfers into slack) while the occupied digits carry
    # runs of up to 16 rows — longer than CH_ROWS=8, hitting the serial
    # extra-chunk path (nchunks up to 3)
    keys = seeded_rng(lo_vals).sample_int_vector(6500, 0, lo_vals - 1)
    _check(keys)


def test_multiblock_constant_keys(tiny_engine):
    # one 16-row run per block per pass; every later pass splices whole blocks
    _check(np.full(7000, 0xDEADBEEF, dtype=np.uint32))


@pytest.fixture
def deep_chunk_engine(monkeypatch):
    """64-row blocks with 8-row splice chunks: a degenerate digit run spans
    up to 9 chunks, driving the extra-chunk DOUBLE-BUFFERED loop well past
    its pipeline depth (c>=3 write-buffer reuse waits + the two-write
    drain) — the shrunken tiny_engine geometry caps nchunks at 3, which
    never reuses a write slot."""
    import importlib

    from glu_tpu.ops import _pallas_sort as ps

    rs = importlib.import_module("glu_tpu.ops.radix_sort")
    monkeypatch.setenv("GLU_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(ps, "BLOCK_R", 64)
    monkeypatch.setattr(ps, "CH_ROWS", 8)
    monkeypatch.setattr(ps, "_READ_ROWS", 16)
    rs._radix_sort_streams.clear_cache()
    yield ps
    rs._radix_sort_streams.clear_cache()


def test_deep_chunk_constant_keys(deep_chunk_engine):
    # one 64-row run per block per pass: nchunks = 9 every splice
    _check(np.full(3 * 64 * 128, 0xCAFEBABE, dtype=np.uint32))


@pytest.mark.parametrize("lo_vals", [2, 3])
def test_deep_chunk_skewed_runs(lo_vals, deep_chunk_engine, seeded_rng):
    # {0..lo_vals-1} keys: long multi-chunk runs landing at MISALIGNED lane
    # offsets (carry rows chained through the double-buffered chunk loop)
    keys = seeded_rng(57 + lo_vals).sample_int_vector(3 * 64 * 128 + 517, 0, lo_vals - 1)
    _check(keys)


@pytest.mark.parametrize("kind", ["presorted", "reverse"])
def test_multiblock_adversarial_orders(kind, tiny_engine):
    keys = np.arange(6100, dtype=np.uint32)
    if kind == "reverse":
        keys = keys[::-1].copy()
    _check(keys)


@pytest.mark.parametrize("num_steps", [1, 3])
def test_multiblock_partial_steps(num_steps, tiny_engine, seeded_rng):
    keys = seeded_rng(17).sample_int_vector(5000, 0, 0xFFFFFFFE)
    _check(keys, num_steps)


def test_multiblock_keys_only(tiny_engine, seeded_rng):
    # single-stream splicer (ns=1): no value stream rides along
    keys = seeded_rng(23).sample_int_vector(6000, 0, 0xFFFFFFFE)
    out = np.asarray(radix_sort_keys(jnp.asarray(keys), backend="pallas"))
    np.testing.assert_array_equal(out, np.sort(keys, kind="stable"))


@pytest.mark.parametrize("nstreams", [2, 3])
def test_multiblock_multi_payload(nstreams, tiny_engine, seeded_rng):
    # N payload streams through one grouped movement + one splice descriptor
    # set (the u64 / dist-partition configuration)
    keys = seeded_rng(41 + nstreams).sample_int_vector(6200, 0, 0xFFFFFFFE)
    payloads = tuple(
        np.arange(keys.size, dtype=np.uint32) * np.uint32(s + 1) for s in range(nstreams)
    )
    out_k, out_vs = radix_sort_multi(
        jnp.asarray(keys), tuple(jnp.asarray(p) for p in payloads), backend="pallas"
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), keys[order])
    for p, o in zip(payloads, out_vs):
        np.testing.assert_array_equal(np.asarray(o), p[order])


@pytest.mark.slow
def test_production_geometry_multiblock(monkeypatch, seeded_rng):
    """The SHIPPED constants (BLOCK_R=1024, CH_ROWS=72), not the shrunken
    ones: a 3-block sort (n≈300K > 2*131072) exercises the multi-block
    splicer at true geometry in interpret mode — the gap the shrunken tests
    cannot close is a constants bug (e.g. _READ_ROWS too small for CH_ROWS,
    slack-row underallocation) that only manifests at production sizes,
    which otherwise only hardware runs would catch."""
    import importlib

    from glu_tpu.ops import _pallas_sort as ps

    rs = importlib.import_module("glu_tpu.ops.radix_sort")
    assert ps.BLOCK_R == 1024 and ps.CH_ROWS == 72, "constants drifted; update test"
    monkeypatch.setenv("GLU_TPU_PALLAS_INTERPRET", "1")
    rs._radix_sort_streams.clear_cache()
    try:
        # 2 full sort passes (8 bits): enough to run group+splice at full
        # geometry twice (runs land on fresh boundaries the second pass)
        # without paying all 8 interpret-mode passes
        keys = seeded_rng(31).sample_int_vector(300_000, 0, 0xFFFFFFFE)
        _check(keys, num_steps=2)
    finally:
        rs._radix_sort_streams.clear_cache()


def test_single_maxblock_per_pass_route(tiny_engine, monkeypatch, seeded_rng):
    # num_blocks==1 with R==BLOCK_R takes the per-pass _group_pass route
    # (splice is the identity); force it by dropping the fused-path ceiling
    from glu_tpu.ops import _pallas_sort as ps

    monkeypatch.setattr(ps, "_FUSE_MAX_R", 8)
    keys = seeded_rng(29).sample_int_vector(2000, 0, 0xFFFFFFFE)
    _check(keys)


@pytest.mark.parametrize("nbits", [5, 6, 7])
def test_multiblock_wide_field_single_pass(nbits, tiny_engine, seeded_rng):
    """Round-5 wide-field path: 5-6 sort bits group in ONE pass of up to
    64 bins with ONE splice (the 16 < D <= 64 distributed bucket
    partition); 7 bits covers the capped fall-back to 4-bit passes.
    Shrunken geometry forces the multi-block splice with fields > 16
    descriptors — short runs, many empty bins, carry rows."""
    size = 6000
    keys = seeded_rng(400 + nbits).sample_int_vector(size, 0, (1 << nbits) - 1)
    vals = np.arange(size, dtype=np.uint32)
    out_k, out_v = radix_sort(
        jnp.asarray(keys), jnp.asarray(vals), backend="pallas",
        bits=tuple(range(nbits)),
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), keys[order])
    np.testing.assert_array_equal(np.asarray(out_v), order.astype(np.uint32))


def test_multiblock_wide_field_multi_stream(tiny_engine, seeded_rng):
    """Wide-field partition shape: 6-bit bucket ids carrying two payload
    streams (the distributed layer's (keys, values) partition)."""
    size = 5000
    b = seeded_rng(77).sample_int_vector(size, 0, 63)
    k = seeded_rng(78).sample_int_vector(size, 0, 0xFFFFFFFE)
    v = np.arange(size, dtype=np.uint32)
    sb, (ok, ov) = radix_sort_multi(
        jnp.asarray(b), (jnp.asarray(k), jnp.asarray(v)), backend="pallas",
        bits=tuple(range(6)),
    )
    order = np.argsort(b, kind="stable")
    np.testing.assert_array_equal(np.asarray(sb), b[order])
    np.testing.assert_array_equal(np.asarray(ok), k[order])
    np.testing.assert_array_equal(np.asarray(ov), order.astype(np.uint32))


@pytest.mark.parametrize(
    "plan",
    [(6, 6, 6, 6, 4, 4), (4, 4, 6, 6, 6, 6), (6, 6, 5, 5, 5, 5), (5, 5, 5, 5, 4, 4, 4), (6, 6, 6, 6, 6, 2)],
)
def test_multiblock_group_plans(plan, tiny_engine, seeded_rng):
    """Full-width mixed group plans (the proto/widefield_full_lab.py knob):
    wide-field and 4-bit passes interleave, so the per-pass chunk geometry
    and the shared max-slack allocation must reproduce the stable sort."""
    from glu_tpu.ops._pallas_sort import pallas_radix_sort_streams

    keys = seeded_rng(900 + plan[0] * 10 + plan[-1]).sample_int_vector(5000, 0, 0xFFFFFFFE)
    vals = np.arange(keys.size, dtype=np.uint32)
    out_k, out_vs = pallas_radix_sort_streams(
        jnp.asarray(keys), [jnp.asarray(vals)], 8, None, plan
    )
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), keys[order])
    np.testing.assert_array_equal(np.asarray(out_vs[0]), order.astype(np.uint32))
