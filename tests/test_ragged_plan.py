"""Unit tests of the ragged-exchange descriptor algebra against a numpy
simulation of `jax.lax.ragged_all_to_all` semantics.

The collective itself executes only on TPU pods (XLA:CPU does not implement
it, and a 1-device TPU mesh takes the exact fast path), so the index algebra
feeding it — clamped starts/sizes and the chunked (src-major, chunk-minor)
placement — is factored into the pure `ragged_exchange_plan`
(glu_tpu/parallel/dist_sort.py) and verified here on CPU: these tests fail
if the descriptor algebra regresses, no collective needed. The analog in the
reference is that every shipped path is executed by `glu_test`
(/root/reference/test/radix_sort_tests.cpp:136-158).
"""

import numpy as np
import pytest

from glu_tpu.parallel.dist_sort import ragged_exchange_plan


def _plan(row_counts, cap):
    starts, sizes, total = ragged_exchange_plan(np.asarray(row_counts), cap)
    return np.asarray(starts), np.asarray(sizes), np.asarray(total)


def simulate_ragged_all_to_all(operands, input_offsets, send_sizes,
                               output_offsets, recv_sizes, recv_capacity, fill):
    """Numpy model of one round of jax.lax.ragged_all_to_all across D devices.

    operands[s]: device s's send buffer. For each (s, d), device s sends
    send_sizes[s][d] elements starting at input_offsets[s][d] of its operand,
    landing at output_offsets[s][d] in device d's output buffer; slots not
    written keep the `output` operand's value (the fill). Any out-of-bounds
    write raises — XLA's behavior for OOB ragged writes is
    implementation-defined, so the plan must keep every write in bounds even
    on overflowing attempts (the clamp invariant under test)."""
    D = len(operands)
    outs = [np.full(recv_capacity, fill, dtype=operands[0].dtype) for _ in range(D)]
    for s in range(D):
        for d in range(D):
            sz = int(send_sizes[s][d])
            io = int(input_offsets[s][d])
            oo = int(output_offsets[s][d])
            assert sz >= 0, f"negative send size at ({s},{d})"
            assert 0 <= io and io + sz <= operands[s].shape[0], "OOB read"
            assert 0 <= oo and oo + sz <= recv_capacity, "OOB write"
            # sender/receiver descriptor agreement (both sides derive from
            # the same all-gathered count matrix)
            assert sz == int(recv_sizes[d][s]), "send/recv descriptor mismatch"
            outs[d][oo:oo + sz] = operands[s][io:io + sz]
    return outs


def _expected_packed(blocks_per_dst, recv_capacity, fill, dtype):
    """dst buffer = blocks concatenated in row order, fill tail."""
    out = np.full(recv_capacity, fill, dtype=dtype)
    pos = 0
    for b in blocks_per_dst:
        out[pos:pos + b.shape[0]] = b
        pos += b.shape[0]
    return out


def _random_case(rng, D, local_n, skew):
    """Per-device bucket-contiguous arrays + the (D, D) count matrix."""
    counts = np.zeros((D, D), dtype=np.int32)
    for s in range(D):
        if skew == "uniform":
            cuts = np.sort(rng.integers(0, local_n + 1, D - 1))
        elif skew == "one-hot":  # whole shard to one destination
            cuts = np.full(D - 1, 0)
            tgt = int(rng.integers(0, D))
            cuts[:tgt] = 0
            cuts[tgt:] = local_n
        else:  # "empty-heavy": most blocks empty
            cuts = np.sort(rng.choice([0, local_n], size=D - 1, p=[0.7, 0.3]))
        bounds = np.concatenate([[0], cuts, [local_n]])
        counts[s] = np.diff(bounds)
    operands = [rng.integers(0, 1 << 32, local_n, dtype=np.uint32) for _ in range(D)]
    offsets = np.cumsum(counts, axis=1) - counts  # bucket-contiguous input offsets
    return operands, counts, offsets


@pytest.mark.parametrize("D", [2, 4, 8])
@pytest.mark.parametrize("skew", ["uniform", "one-hot", "empty-heavy"])
def test_plan_matches_packed_layout_when_fitting(D, skew):
    rng = np.random.default_rng(D * 100 + len(skew))
    local_n = 257
    for trial in range(10):
        operands, counts, in_offs = _random_case(rng, D, local_n, skew)
        # capacity that always fits: worst case one dst receives everything
        cap = D * local_n
        starts, sizes, total = _plan(counts, cap)
        np.testing.assert_array_equal(total, counts.sum(axis=0))
        assert (total <= cap).all()
        # no clamp engaged: sizes == counts exactly
        np.testing.assert_array_equal(sizes, counts)
        outs = simulate_ragged_all_to_all(
            operands, in_offs, sizes, starts, sizes.T, cap, 0xFFFFFFFF
        )
        for d in range(D):
            blocks = [
                operands[s][in_offs[s, d]:in_offs[s, d] + counts[s, d]]
                for s in range(D)
            ]
            np.testing.assert_array_equal(
                outs[d], _expected_packed(blocks, cap, 0xFFFFFFFF, np.uint32)
            )


@pytest.mark.parametrize("D", [2, 4, 8])
def test_plan_overflow_writes_stay_in_bounds(D):
    """Overflowing attempts still execute the transfer first; the clamp must
    keep every write inside [0, recv_capacity) and the true totals must
    exceed the capacity exactly where the receiver overflows."""
    rng = np.random.default_rng(D)
    local_n = 300
    cap = int(1.1 * local_n)  # the shipped receiver-budget shape
    for trial in range(20):
        operands, counts, in_offs = _random_case(
            rng, D, local_n, "one-hot" if trial % 2 else "uniform"
        )
        starts, sizes, total = _plan(counts, cap)
        # clamp invariants
        assert (starts >= 0).all() and (starts <= cap).all()
        assert (sizes >= 0).all()
        assert (starts + sizes <= cap).all()
        # simulation itself asserts every write is in bounds
        outs = simulate_ragged_all_to_all(
            operands, in_offs, sizes, starts, sizes.T, cap, 0xFFFFFFFF
        )
        for d in range(D):
            if total[d] <= cap:
                # fitting receivers get the exact packed layout even when
                # OTHER receivers overflow
                blocks = [
                    operands[s][in_offs[s, d]:in_offs[s, d] + counts[s, d]]
                    for s in range(D)
                ]
                np.testing.assert_array_equal(
                    outs[d], _expected_packed(blocks, cap, 0xFFFFFFFF, np.uint32)
                )


@pytest.mark.parametrize("D,C", [(2, 2), (4, 2), (4, 4), (8, 3)])
def test_chunked_plan_src_major_chunk_minor(D, C):
    """The chunked path feeds the SAME plan a (D*C, D) matrix whose rows are
    (src, chunk) in src-major, chunk-minor order; the receiver layout must be
    src-major, chunk-minor — source s's chunk c covers smaller global indices
    than its chunk c+1, which is what makes the exchange stable."""
    rng = np.random.default_rng(D * 10 + C)
    chunk_n = 64
    for trial in range(10):
        # per (s, c): independent bucket split of a chunk
        row_counts = np.zeros((D * C, D), dtype=np.int32)
        chunk_ops = {}
        chunk_offs = {}
        for s in range(D):
            for c in range(C):
                cuts = np.sort(rng.integers(0, chunk_n + 1, D - 1))
                bounds = np.concatenate([[0], cuts, [chunk_n]])
                row = s * C + c  # src-major, chunk-minor
                row_counts[row] = np.diff(bounds)
                chunk_ops[(s, c)] = rng.integers(0, 1 << 32, chunk_n, dtype=np.uint32)
                chunk_offs[(s, c)] = np.cumsum(row_counts[row]) - row_counts[row]
        cap = D * C * chunk_n
        starts, sizes, total = _plan(row_counts, cap)
        np.testing.assert_array_equal(sizes, row_counts)
        # simulate chunk by chunk exactly as _exchange_and_sort_chunked does:
        # chunk c's exchange uses rows {s*C+c} of the plan
        outs = [np.full(cap, 0xFFFFFFFF, dtype=np.uint32) for _ in range(D)]
        for c in range(C):
            rows = [s * C + c for s in range(D)]
            sub_sizes = sizes[rows]           # (D, D): chunk c of each src
            sub_starts = starts[rows]
            step = simulate_ragged_all_to_all(
                [chunk_ops[(s, c)] for s in range(D)],
                np.stack([chunk_offs[(s, c)] for s in range(D)]),
                sub_sizes, sub_starts, sub_sizes.T, cap, 0xFFFFFFFF,
            )
            for d in range(D):
                written = step[d] != 0xFFFFFFFF
                outs[d][written] = step[d][written]
                # also honor legitimately-written 0xFFFFFFFF data: overwrite
                # the exact descriptor ranges
                for s in range(D):
                    oo, sz = int(sub_starts[s][d]), int(sub_sizes[s][d])
                    outs[d][oo:oo + sz] = step[d][oo:oo + sz]
        for d in range(D):
            blocks = [
                chunk_ops[(s, c)][chunk_offs[(s, c)][d]:
                                  chunk_offs[(s, c)][d] + row_counts[s * C + c, d]]
                for s in range(D) for c in range(C)   # src-major, chunk-minor
            ]
            np.testing.assert_array_equal(
                outs[d], _expected_packed(blocks, cap, 0xFFFFFFFF, np.uint32)
            )


def test_plan_zero_and_degenerate_counts():
    # all-empty rows
    starts, sizes, total = _plan(np.zeros((4, 4), dtype=np.int32), 100)
    assert (sizes == 0).all() and (total == 0).all()
    # single device "mesh" row
    starts, sizes, total = _plan(np.array([[7]]), 7)
    assert starts[0, 0] == 0 and sizes[0, 0] == 7 and total[0] == 7
    # capacity zero: everything clamps to empty, nothing negative
    starts, sizes, total = _plan(np.array([[3, 2], [1, 4]]), 0)
    assert (starts == 0).all() and (sizes == 0).all()
