"""Pallas radix-sort engine: LSD radix-16, VMEM bit-split blocks + DMA splicer.

TPU-native replacement for the reference's count/scan/reorder GLSL pipeline
(glu/RadixSort.hpp:33-57, :311, :60-183). Same LSD contract — 8 stable
passes of 4 bits each, double-buffered arrays, partial execution via
`num_steps` (RadixSort.hpp:273,332) — but every stage is re-designed for a
machine with no global atomics and no vector scatter:

  PASS p (bits 4p..4p+3):
    K1 `group`  — grid over S = BLOCK_R*128 element blocks resident in
        VMEM. Each block is stably grouped by its 4-bit digit via four
        1-bit SPLITS built from TPU-legal vector movement only:
          a. in-row split: each 128-lane row is stably partitioned by the
             bit; the in-row inverse permutation comes from a 7-step
             binary search over the row's inclusive zero count (lane
             gathers) — the VPU analog of the reference's shared-memory
             Blelloch ranks (RadixSort.hpp:102-140);
          b. route: each element is lane-gathered to its FINAL lane
             (dest mod 128) and tagged with its dest-row distance — pure
             arithmetic once rows are grouped;
          c. column shift: per class (zeros move up, ones move down), a
             masked log-step sublane shift walks every element to its
             dest row. Collision-free: per (lane, class), dest rows are
             strictly monotone in source position.
        The kernel also emits each block's 16-bin digit histogram (the
        reference's atomicAdd count shader, RadixSort.hpp:42-48, as dense
        predicate sums — TPU has no fast atomics).
    glue — two tiny cumsums turn the [block, 16] counts into run
        descriptors (src, dst, len), bucket-major: the reference's
        16-partition Blelloch scan of [digit][block] (RadixSort.hpp:311).
    K2 `splice` — a sequential-grid DMA kernel concatenates every block's
        digit-d run into the global digit-d region: chunked row-aligned
        dynamic-offset copies, lane-rotated to destination alignment, with
        a carry row stitching misaligned run boundaries. This realizes the
        reference's scatter (reorder shader :142-182) as large linear
        DMAs — the only efficient "scatter" a TPU has.

Every stage is generic over the number of PAYLOAD STREAMS riding the key:
the reference moves exactly (key, value) (RadixSort.hpp:172-180); here 0
streams is the keys-only sort (half the splice DMA of the pair sort), 1 is
the reference contract, and N>1 carries multi-word keys (u64 halves) or the
distributed layer's (hi, lo, value) payloads through ONE grouped movement —
one descriptor set, one walk per split, N+1 DMA stream pairs.

Stability: every stage is stable, and runs are spliced in (digit, block)
order. The tail padding (0xFFFFFFFF keys) has the maximal digit each pass
and starts positionally last, so it stays the exact global tail through
all passes (replacing the reference's per-thread bounds checks,
RadixSort.hpp:41,160).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._pallas_common import interpret_mode, narrow_cumsum_incl  # noqa: F401 — narrow_cumsum_incl
# is re-exported for the proto/ measurement labs; the engine itself now uses
# _col_prefix_wide (see below) after the round-3 colwide discovery.
from ..utils.log import vlog
from .radix_sort import RADIX_BITS

LANES = 128
FIELD_BITS = 4                 # bits grouped per internal pass (= one
                               # reference-visible 4-bit pass)
FIELDS = 1 << FIELD_BITS

# Engine geometry. Module-level (not baked into closures) so tests can shrink
# them to force every multi-block splicer path — carry rows, misaligned run
# boundaries, empty runs, nchunks>1 serial chunks — at tiny n in interpret
# mode. Kernels read these at trace time; callers monkeypatching them must
# clear the host-level jit caches (tests/test_splicer.py does).
BLOCK_R = 1024                 # rows per block; block = 131072 elements
CH_ROWS = 72                   # splice chunk-height CAP: the per-sort chunk is
                               # min(CH_ROWS, R//16 + 8) — a typical run is
                               # R/FIELDS rows, +8 covers the misaligned
                               # boundary, and tighter chunks at R=512 cut the
                               # splice's fixed 2.5x overread (measured 199.2
                               # -> 205.7 M keys/s at 268M)
_READ_ROWS = CH_ROWS + 8       # read-size cap (sublane-aligned, covers CH+1 rows)
_FUSE_MAX_R = 512              # largest single block the fused whole-sort kernel handles


def _chunk_rows(r: int, fields: int = FIELDS) -> tuple[int, int]:
    """(chunk rows, DMA read rows) for block height r: sized to one typical
    run (r/fields rows), capped by the module constants (which
    shrunken-geometry tests monkeypatch to force the multi-chunk serial
    path at tiny n)."""
    ch = min(CH_ROWS, r // fields + 8)
    return ch, min(_READ_ROWS, ch + 8)


def _slack_rows(ch: int, rd: int) -> int:
    """Splicer src/dst over-read/-write padding (derived from live geometry)."""
    return 2 * ch + rd


def _lanes(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _rows(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)


def _inrow_cumsum(x):
    """Plain in-row roll-scan — superseded in the engine by
    _packed4_inrow_cumsum; kept as the reference implementation the
    proto/ labs price variants against."""
    lanes = _lanes(x.shape)
    s = 1
    while s < LANES:
        x = x + jnp.where(lanes >= s, pltpu.roll(x, s, axis=x.ndim - 1), 0)
        s *= 2
    return x


def _col_prefix_wide(col, rows_n):
    """Inclusive sublane prefix of an (R, 1) column via a lane-REPLICATED
    (R, 128) scan, sliced back to (R, 1). Narrow-layout sublane scans are
    pathological on this stack (each roll step relayouts; the reshape trick
    in narrow_cumsum_incl is no better inside a big kernel): swapping this
    in for the split's Zin scan measured 789 -> 587 ps/elem per 4-bit group
    pass at R=1024 (proto/rank16_lab.py variant E) — the same colwide fix
    that took the scan kernel from 14.2 to 8.2 ms at 268M."""
    wide = jax.lax.broadcast_in_dim(col, (rows_n, LANES), (0, 1))
    rows = jax.lax.broadcasted_iota(jnp.int32, wide.shape, 0)
    s = 1
    while s < rows_n:
        wide = wide + jnp.where(rows >= s, pltpu.roll(wide, s, axis=0), 0)
        s *= 2
    return wide[:, 0:1]


def _packed4_inrow_cumsum(z):
    """Inclusive in-row cumsum of an (R,128) 0/1 array, 4 rows at a time:
    rows r, r+R/4, r+R/2, r+3R/4 pack into one u32's byte fields (row sums
    <= 128 = 0x80 fit a byte, so fields never carry into each other) and ONE
    (R/4,128) roll-scan serves all four — quartering the vreg traffic of the
    split's cumsum phase (measured 244.6 -> 195.3 ps/elem/split at R=1024,
    proto/group_lab.py v4). Mosaic has no 16-bit rotate, so sub-wording is
    done by hand in u32."""
    R = z.shape[0]
    Q = R // 4
    zq = z.reshape(4, Q, LANES).astype(jnp.uint32)
    packed = (zq[0] | (zq[1] << 8) | (zq[2] << 16) | (zq[3] << 24)).astype(jnp.int32)
    lanesq = _lanes((Q, LANES))
    s = 1
    while s < LANES:
        packed = packed + jnp.where(lanesq >= s, pltpu.roll(packed, s, axis=1), 0)
        s *= 2
    xu = packed.astype(jnp.uint32)
    return jnp.concatenate(
        [xu & 0xFF, (xu >> 8) & 0xFF, (xu >> 16) & 0xFF, (xu >> 24) & 0xFF], axis=0
    ).reshape(R, LANES).astype(jnp.int32)


def _split_round(k, vs, bit):
    """One stable 1-bit split of a (R, 128) key block plus `vs` payload
    blocks (list, possibly empty) in row-major order. Returns (k, vs)."""
    R = k.shape[0]
    lanes = _lanes((R, LANES))
    rows = _rows((R, LANES))
    z = 1 - bit
    cumZ = _packed4_inrow_cumsum(z)               # inclusive zeros per row
    c0 = cumZ[:, LANES - 1 : LANES]               # (R,1)
    Zin = _col_prefix_wide(c0, R)
    Zex = Zin - c0                                # zeros before this row
    n0 = Zin[R - 1, 0]                            # total zeros
    Oex = _rows((R, 1)) * LANES - Zex             # ones before this row

    # a. in-row split (binary-searched inverse, then one gather per array)
    is_zero_slot = lanes < c0
    target = jnp.where(is_zero_slot, lanes + 1, lanes - c0 + 1)
    lo = jnp.zeros((R, LANES), jnp.int32)
    step = LANES // 2
    while step >= 1:
        mid = lo + step - 1
        cz = jnp.take_along_axis(cumZ, mid, axis=1)
        cm = jnp.where(is_zero_slot, cz, mid + 1 - cz)
        lo = jnp.where(cm < target, lo + step, lo)
        step //= 2
    gk = jnp.take_along_axis(k, lo, axis=1)       # rows grouped [zeros|ones]
    gvs = [jnp.take_along_axis(v, lo, axis=1) for v in vs]

    # b. route to final lane + dest-row tag
    def route(Fc, base, cnt):
        rank = (lanes - Fc) & (LANES - 1)   # floor-mod: & works for negatives
        src = jnp.clip(base + rank, 0, LANES - 1)
        rk = jnp.take_along_axis(gk, src, axis=1)
        rvs = [jnp.take_along_axis(gv, src, axis=1) for gv in gvs]
        valid = rank < cnt
        q = (Fc >> 7) + jnp.where(lanes < (Fc & (LANES - 1)), 1, 0)
        # flagless meta: remaining row delta only (0 = inert). A valid
        # element with delta 0 is already home and behaves identically to
        # an empty slot in the walk, so no occupancy flag is needed.
        meta = jnp.where(valid, jnp.abs(q - rows), 0)
        return rk, rvs, meta

    # c. masked sublane log-shift to dest rows
    def colshift(rk, rvs, meta, up):
        s = 1
        while s < R:
            t = (R - s) % R if up else s          # roll: row r -> row r+t
            rk_s = pltpu.roll(rk, t, axis=0)
            m_s = pltpu.roll(meta, t, axis=0)
            arrive = (m_s & s) != 0
            stay = (meta & s) == 0
            rk = jnp.where(arrive, rk_s, rk)
            rvs = [jnp.where(arrive, pltpu.roll(rv, t, axis=0), rv) for rv in rvs]
            meta = jnp.where(arrive, m_s - s, jnp.where(stay, meta, 0))
            s *= 2
        return rk, rvs

    zk, zvs, zmeta = route(Zex, jnp.zeros((R, 1), jnp.int32), c0)
    ok_, ovs_, ometa = route(jnp.int32(n0) + Oex, c0, LANES - c0)
    zk, zvs = colshift(zk, zvs, zmeta, up=True)
    ok_, ovs_ = colshift(ok_, ovs_, ometa, up=False)
    sel = (rows * LANES + lanes) < n0
    out_k = jnp.where(sel, zk, ok_)
    out_vs = [jnp.where(sel, a, b) for a, b in zip(zvs, ovs_)]
    return out_k, out_vs


def _group_block(k, vs, pos_ref, nbits):
    """Group a (R,128) block stably by the `nbits` key bits whose positions
    are in the SMEM array `pos_ref` (LSB-first splits: pos_ref[0] is least
    significant). The contiguous full-sort case is pos_ref = [s, s+1, s+2,
    s+3]; arbitrary positions carry the bit-pruned adaptive sorts."""
    for b in range(nbits):
        p = pos_ref[b].astype(jnp.uint32)
        bit = ((k >> p) & jnp.uint32(1)).astype(jnp.int32)
        k, vs = _split_round(k, vs, bit)
    return k, vs


def _counts_row(k, pos_ref, nbits):
    """2**nbits-bin histogram of the compact digit formed by the key bits at
    `pos_ref[0..nbits)`, laid into an (8,128) tile (row 0, lanes
    0..2**nbits-1) — the Mosaic-aligned counts output."""
    digit = jnp.zeros(k.shape, jnp.uint32)
    for j in range(nbits):
        p = pos_ref[j].astype(jnp.uint32)
        digit = digit | (((k >> p) & jnp.uint32(1)) << jnp.uint32(j))
    rows8 = _rows((8, LANES))
    lanes8 = _lanes((8, LANES))
    res = jnp.zeros((8, LANES), jnp.int32)
    for d in range(1 << nbits):
        c = jnp.sum((digit == jnp.uint32(d)).astype(jnp.int32))
        res = res + jnp.where((rows8 == 0) & (lanes8 == d), c, 0)
    return res


def _group_pass(pos_arr, keys2d, values2d, R, interpret, num_blocks=None, nbits=FIELD_BITS):
    """K1: returns (grouped keys, grouped value streams (list), counts
    (B, FIELDS)). values2d is a list of payload arrays (possibly empty).
    keys2d may carry trailing slack rows (excluded via num_blocks); grid
    steps only touch rows [0, num_blocks*R), the slack region passes
    through unwritten (don't-care for the splicer's over-reads).

    pos_arr is an (nbits,) i32 array of bit positions (SMEM — one compiled
    kernel serves every pass); nbits < FIELD_BITS happens on the last pass
    of a bit-pruned sort (buckets >= 2**nbits simply count zero, which the
    run-descriptor/splice machinery already treats as empty runs)."""
    ns = len(values2d)
    if num_blocks is None:
        num_blocks = keys2d.shape[0] // R
    data_spec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    data_shape = jax.ShapeDtypeStruct(keys2d.shape, jnp.uint32)
    cnt_shape = jax.ShapeDtypeStruct((num_blocks, 8, LANES), jnp.int32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def kernel(pos_ref, *refs):
        k_ref = refs[0]
        v_refs = refs[1 : 1 + ns]
        ok_ref = refs[1 + ns]
        ov_refs = refs[2 + ns : 2 + 2 * ns]
        cnt_ref = refs[2 + 2 * ns]
        k, vs = _group_block(k_ref[:], [v[:] for v in v_refs], pos_ref, nbits)
        ok_ref[:] = k
        for o, v in zip(ov_refs, vs):
            o[:] = v
        cnt_ref[0] = _counts_row(k, pos_ref, nbits)

    outs = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[smem] + [data_spec] * (1 + ns),
        out_specs=[data_spec] * (1 + ns) + [cnt_spec],
        out_shape=[data_shape] * (1 + ns) + [cnt_shape],
        interpret=interpret,
        compiler_params=params,
    )(pos_arr, keys2d, *values2d)
    return outs[0], list(outs[1 : 1 + ns]), outs[1 + ns][:, 0, : 1 << nbits]


def _splice_kernel_factory(ns: int, ch: int, rd: int):
    """Kernel body copying run i (grid step i) of `ns` streams: flat
    [src, src+len) -> flat [dst, dst+len) with shared descriptors.

    Software-pipelined across the sequential grid: step i consumes the
    reads issued at step i-1 (double-buffered slots), issues run i+1's
    reads before waiting on its own writes, and defers its write completion
    to step i+1 (which must wait anyway before touching the shared
    boundary row). Every step issues exactly one read set and one write
    set (dummy transfers into the slack region for empty runs) so the
    semaphore accounting is static. Runs longer than ch take an inline
    extra-chunk loop that is ITSELF double-buffered (slots 2/3, sem_x
    reads / sem_xw writes): chunk c+1's read is in flight under chunk c's
    rotate+write, and chunk c's write completion is deferred two chunks.
    Long runs are exactly the skewed-digit case (low-entropy/zipf keys
    collapse whole blocks into one run per pass), so this loop must stream
    at DMA rate — the round-3 serial start-wait-per-chunk form cost 25%
    of whole-sort throughput on low-entropy keys (CHECK_r03.json).

    Index algebra: delta = dst - src, rot = delta mod 128,
    dq = (delta - rot)/128. Output row j, lane l takes
    src[(dst_row + j) - dq - (1 if l < rot else 0), (l - rot) mod 128].
    Reads cover rd source rows starting one row before the first
    needed hi row; when that pre-row would be source row -1 the read clamps
    to 0 and the lo tile is realigned by a one-row roll (see `tiles`).
    Writes are whole ch chunks; spill beyond the run's end is rewritten
    by later runs (ascending dst order) or lands in padded slack. Per-stream
    carry scratch holds the previous run's last output row for the boundary
    merge."""

    def body(s_ref, d_ref, l_ref, n_ref, *refs):
        src_refs = refs[:ns]
        dst_refs = refs[ns : 2 * ns]
        rbufs = refs[2 * ns : 3 * ns]
        wbufs = refs[3 * ns : 4 * ns]
        carries = refs[4 * ns : 5 * ns]
        sem_rd = refs[5 * ns]
        sem_wr = refs[5 * ns + 1]
        sem_x = refs[5 * ns + 2]
        sem_xw = refs[5 * ns + 3]

        # the dynamic run count rides in SMEM rather than pl.num_programs:
        # the HLO interpreter's transforms feed num_programs back at the
        # x64-default width, tripping dtype checks in recorded comparisons
        i = jnp.asarray(pl.program_id(0), jnp.int32)
        nruns = n_ref[0]
        slack_row = dst_refs[0].shape[0] - ch  # dummy-write target in slack

        def rd0_of(run):
            src = s_ref[run]
            dst = d_ref[run]
            ln = l_ref[run]
            dq = (dst - src - (dst - src) % LANES) // LANES
            hi0 = dst // LANES - dq
            return jnp.where(ln > 0, jnp.maximum(hi0 - 1, 0), 0)

        def read_chunk(run, slot, start):
            rd0 = rd0_of(run)
            for s in range(ns):
                cp = pltpu.make_async_copy(
                    src_refs[s].at[pl.ds(rd0, rd), :],
                    rbufs[s].at[slot],
                    sem_rd.at[slot, s],
                )
                cp.start() if start else cp.wait()

        def write_wait(slot):
            for s in range(ns):
                pltpu.make_async_copy(
                    wbufs[s].at[slot],
                    dst_refs[s].at[pl.ds(slack_row, ch), :],
                    sem_wr.at[slot, s],
                ).wait()

        slot = i % 2

        @pl.when(i == 0)
        def _():
            read_chunk(0, 0, True)

        read_chunk(i, slot, False)

        # prefetch next run's read before stalling on anything else
        @pl.when(i + 1 < nruns)
        def _():
            read_chunk(i + 1, (i + 1) % 2, True)

        src = s_ref[i]
        dst = d_ref[i]
        ln = l_ref[i]
        delta = dst - src
        rot = delta % LANES
        dq = (delta - rot) // LANES
        dst_r0 = dst // LANES
        dst_l0 = dst % LANES
        n_out_rows = (dst_l0 + ln + LANES - 1) // LANES
        nchunks = (n_out_rows + ch - 1) // ch
        lanes2 = _lanes((ch, LANES))
        rows2 = _rows((ch, LANES))
        idx = (lanes2 - rot) % LANES

        # extra-chunk (long-run) copy sets: chunk c >= 1 of this run, double-
        # buffered through rbuf/wbuf slots 2+pslot
        def xread(c, pslot):
            hi0c = dst_r0 + c * ch - dq
            rd0c = jnp.maximum(hi0c - 1, 0)
            return [
                pltpu.make_async_copy(
                    src_refs[s].at[pl.ds(rd0c, rd), :],
                    rbufs[s].at[2 + pslot],
                    sem_x.at[pslot, s],
                )
                for s in range(ns)
            ]

        def xwrite(c, pslot):
            return [
                pltpu.make_async_copy(
                    wbufs[s].at[2 + pslot],
                    dst_refs[s].at[pl.ds(dst_r0 + c * ch, ch), :],
                    sem_xw.at[pslot, s],
                )
                for s in range(ns)
            ]

        # prime the extra-chunk pipeline before chunk 0's VPU work so the
        # first extra read rides under it
        @pl.when(nchunks > 1)
        def _():
            for cp in xread(1, 0):
                cp.start()

        def rotate(tile_hi, tile_lo, carry, is_first):
            a = jnp.take_along_axis(tile_hi, idx, axis=1)
            b = jnp.take_along_axis(tile_lo, idx, axis=1)
            out = jnp.where(lanes2 >= rot, a, b)
            return jnp.where(is_first & (rows2 == 0) & (lanes2 < dst_l0), carry[0], out)

        def tiles(buf, slot_, base_):
            """(hi, lo) tiles with lo[j] = hi[j-1]. When the read window
            starts at source row 0 (base_ == 0, the pre-window row doesn't
            exist), the clamped second slice would alias hi — realign it
            with a one-row roll instead; its row 0 is garbage, but row 0's
            lanes < rot are always masked there (hi0 == 0 forces
            dst_l0 >= rot, so the carry merge covers them)."""
            hi = buf[slot_, pl.ds(base_, ch), :]
            lo_raw = buf[slot_, pl.ds(jnp.maximum(base_ - 1, 0), ch), :]
            lo = jnp.where(base_ > 0, lo_raw, pltpu.roll(lo_raw, 1, axis=0))
            return hi, lo

        # --- chunk 0 (pipelined) ------------------------------------------
        # compute BEFORE waiting the previous write: pure VPU work
        hi0 = dst_r0 - dq
        rd0 = jnp.maximum(hi0 - 1, 0)
        base = hi0 - rd0

        for s in range(ns):
            hi, lo_ = tiles(rbufs[s], slot, base)
            wbufs[s][slot] = rotate(hi, lo_, carries[s], ln > 0)
        last0 = n_out_rows - 1

        @pl.when((ln > 0) & (last0 < ch))
        def _():
            for s in range(ns):
                carries[s][0] = wbufs[s][slot, last0, :]

        # previous step's write must complete before we touch the shared
        # boundary row (and before slot reuse)
        @pl.when(i > 0)
        def _():
            write_wait(1 - slot)

        wrow = jnp.where(ln > 0, dst_r0, slack_row)
        for s in range(ns):
            pltpu.make_async_copy(
                wbufs[s].at[slot],
                dst_refs[s].at[pl.ds(wrow, ch), :],
                sem_wr.at[slot, s],
            ).start()

        # --- extra chunks (long runs: skewed digit histograms) ------------
        # double-buffered streaming loop; chunk 1's read was primed above
        @pl.when(nchunks > 1)
        def _():
            def chunk_body(c, _):
                c = jnp.asarray(c, jnp.int32)  # x64 fori_loop widens the index
                pslot = (c - 1) % 2
                for cp in xread(c, pslot):
                    cp.wait()

                @pl.when(c + 1 < nchunks)
                def _():
                    for cp in xread(c + 1, 1 - pslot):
                        cp.start()

                # chunk c-2 wrote from this wbuf slot; its DMA must land
                # before the rotate below overwrites the buffer
                @pl.when(c >= 3)
                def _():
                    for cp in xwrite(c - 2, pslot):
                        cp.wait()

                hi0c = dst_r0 + c * ch - dq
                rd0c = jnp.maximum(hi0c - 1, 0)
                basec = hi0c - rd0c
                for s in range(ns):
                    hi, lo_ = tiles(rbufs[s], 2 + pslot, basec)
                    wbufs[s][2 + pslot] = rotate(hi, lo_, carries[s], False)
                lastc = last0 - c * ch

                @pl.when((lastc >= 0) & (lastc < ch))
                def _():
                    for s in range(ns):
                        carries[s][0] = wbufs[s][2 + pslot, lastc, :]

                for cp in xwrite(c, pslot):
                    cp.start()
                return 0

            jax.lax.fori_loop(1, nchunks, chunk_body, 0)

            # drain the (up to two) outstanding extra writes: the next run
            # rewrites our spill rows and must order after them
            last_c = nchunks - 1

            @pl.when(last_c >= 2)
            def _():
                for cp in xwrite(last_c - 1, (last_c - 2) % 2):
                    cp.wait()

            for cp in xwrite(last_c, (last_c - 1) % 2):
                cp.wait()

        # drain the last step's own write
        @pl.when(i == nruns - 1)
        def _():
            write_wait(slot)

    return body


def _splice_streams(srcs, dsts, lens, nruns, streams, total_rows, ch, rd, interpret):
    """K2: sequential run splicer over `streams` (list of (rows, 128) padded
    sources moved with shared descriptors, ch-row chunks / rd-row reads).
    `nruns` is the traced count of non-empty descriptors (dynamic grid —
    empty slots beyond it are never dispatched). Returns the spliced list."""
    ns = len(streams)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = [jax.ShapeDtypeStruct((total_rows, LANES), jnp.uint32)] * ns
    outs = pl.pallas_call(
        _splice_kernel_factory(ns, ch, rd),
        grid=(nruns,),
        in_specs=[smem, smem, smem, smem] + [anyspec] * ns,
        out_specs=[anyspec] * ns,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((4, rd, LANES), jnp.uint32) for _ in range(ns)]  # read bounce (2 run-pipelined + 2 extra-chunk)
            + [pltpu.VMEM((4, ch, LANES), jnp.uint32) for _ in range(ns)]   # write bounce
            + [pltpu.VMEM((8, LANES), jnp.uint32) for _ in range(ns)]            # carry (row 0)
            + [
                pltpu.SemaphoreType.DMA((2, ns)),  # pipelined reads
                pltpu.SemaphoreType.DMA((2, ns)),  # pipelined writes
                pltpu.SemaphoreType.DMA((2, ns)),  # extra-chunk reads
                pltpu.SemaphoreType.DMA((2, ns)),  # extra-chunk writes
            ]
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(srcs, dsts, lens, nruns.reshape(1), *streams)
    return list(outs)


def _run_descriptors(counts, R):
    """counts: (B, 16) per-block digit counts. Returns (srcs, dsts, lens,
    nruns) flat run descriptors in bucket-major (ascending dst) order — the
    glue replacing the reference's BlellochScan over [digit][block]
    (RadixSort.hpp:311).

    EMPTY runs are compacted out and `nruns` (traced i32) counts the
    survivors: the splicer's grid is dynamic, so empty descriptor slots are
    never dispatched. Skewed digit histograms (low-entropy/zipf keys) leave
    most of the B*16 slots empty — before compaction each one still cost a
    full-size dummy read+write (rd+ch rows/stream into slack), 2.5x the
    USEFUL splice traffic on %10 keys. Compaction is order-preserving, so
    the ascending-dst spill-rewrite invariant survives; the tail beyond
    `nruns` stays zeroed (len 0 = dummy) as a safety net."""
    B = counts.shape[0]
    inblock = jnp.cumsum(counts, axis=1) - counts            # (B,FIELDS) src offset in block
    srcs = (jnp.arange(B, dtype=jnp.int32)[:, None] * (R * LANES) + inblock).T.reshape(-1)
    per_digit = jnp.cumsum(counts, axis=0) - counts          # (B,FIELDS) excl over blocks
    totals = jnp.sum(counts, axis=0)
    digit_base = jnp.cumsum(totals) - totals                 # (FIELDS,)
    dsts = (digit_base[None, :] + per_digit).T.reshape(-1)
    lens = counts.T.reshape(-1)
    mask = lens > 0
    nruns = jnp.sum(mask.astype(jnp.int32))
    tgt = jnp.where(mask, jnp.cumsum(mask.astype(jnp.int32)) - 1, mask.shape[0])
    compact = lambda a: jnp.zeros_like(a).at[tgt].set(a, mode="drop")
    return (
        compact(srcs.astype(jnp.int32)),
        compact(dsts.astype(jnp.int32)),
        compact(lens.astype(jnp.int32)),
        jnp.maximum(nruns, 1),  # grid >= 1; an all-empty slot 0 is a dummy
    )


# SMEM budget for the splice run descriptors (srcs/dsts/lens are scalar
# SMEM inputs; the space is ~1 MB — R=256 at 268M and R=1024 at 805M both
# hit "Ran out of memory in memory space smem" before this bound existed)
_DESC_SMEM_BUDGET = 768 * 1024


def _desc_bytes(rows: int, r: int, fields: int = FIELDS) -> int:
    return -(-rows // r) * fields * 3 * 4


def _choose_block_rows(n: int, fields: int = FIELDS) -> int:
    """Pick the block height: smallest power-of-two row count whose block
    covers n, capped at BLOCK_R (VMEM budget) for mid sizes.

    Large inputs refine the cap in both directions, bounded by the splice
    descriptor SMEM budget: 512-row blocks walk one fewer sublane step per
    split (~2% whole-sort, measured 194.5 -> 198.7 M keys/s at 268M) and
    are preferred while their descriptors fit; beyond that the height
    DOUBLES past BLOCK_R (runs longer than CH_ROWS take the splicer's
    serial extra-chunk path — slower, but these sizes previously failed to
    compile outright)."""
    rows = max(8, -(-n // LANES))
    r = 8
    while r < rows and r < BLOCK_R:
        r *= 2
    if fields > FIELDS and rows > r:
        # wide-field pass (the 5-7-bit single-splice partition): taller
        # blocks keep the typical run (r/fields rows) long enough that the
        # splicer's fixed per-run chunk traffic stays a small multiple of
        # the useful bytes (32-row runs => (ch+rd)/run ~ 2.75x)
        while r < min(32 * fields, 4 * BLOCK_R) and r < rows:
            r *= 2
    if (
        r == BLOCK_R
        and rows > BLOCK_R  # single-block inputs keep the identity-splice path
        and BLOCK_R > 512
        and fields <= FIELDS
        and _desc_bytes(rows, 512, fields) <= _DESC_SMEM_BUDGET
    ):
        return 512
    while _desc_bytes(rows, r, fields) > _DESC_SMEM_BUDGET:
        r *= 2
    return r


def _single_block_sort(keys2d, values2d, R, positions, interpret):
    """Fused path for single-block inputs: every 1-bit split in ONE kernel
    invocation (the splice is the identity when there is only one block, so
    the whole LSD sort collapses into one VMEM-resident kernel — 8
    dispatch+glue round trips fewer than the general path; the analog of
    how the reference's small sorts are dominated by its per-pass dispatch
    overhead, README.md:120-125). `positions` lists the split bit positions
    LSB-first (SMEM array, dynamically indexed by the split loop — one
    compiled kernel per split COUNT, not per bit set)."""
    nbits = len(positions)
    ns = len(values2d)

    def kernel(pos_ref, *refs):
        k_ref = refs[0]
        v_refs = refs[1 : 1 + ns]
        ok_ref = refs[1 + ns]
        ov_refs = refs[2 + ns :]

        def body(b, kv):
            k, vs = kv
            p = pos_ref[b].astype(jnp.uint32)
            bit = ((k >> p) & jnp.uint32(1)).astype(jnp.int32)
            k, vs = _split_round(k, list(vs), bit)
            return k, tuple(vs)

        k, vs = jax.lax.fori_loop(
            0, nbits, body, (k_ref[:], tuple(v[:] for v in v_refs))
        )
        ok_ref[:] = k
        for o, v in zip(ov_refs, vs):
            o[:] = v

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    spec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(keys2d.shape, jnp.uint32)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    outs = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[smem] + [spec] * (1 + ns),
        out_specs=[spec] * (1 + ns),
        out_shape=[shape] * (1 + ns),
        interpret=interpret,
        compiler_params=params,
    )(jnp.asarray(positions, dtype=jnp.int32), keys2d, *values2d)
    return outs[0], list(outs[1:])


def pallas_radix_sort_streams(
    keys: jax.Array, payloads, num_steps: int, bit_positions=None, group_plan=None
):
    """Stable LSD radix sort of u32 keys with a LIST of u32 payload streams
    permuted identically (reference operator() semantics for the (key,
    value) case, RadixSort.hpp:273; N-stream movement is the TPU extension
    the multi-word-key and distributed layers build on). Returns
    (sorted keys, list of permuted payloads).

    bit_positions (optional, static tuple) restricts the sort to the given
    key bit positions, LSB-first — the bit-pruned path under the adaptive
    sorts: only ceil(len(bit_positions)/FIELD_BITS) passes run instead of
    num_steps. None means bits 0..4*num_steps-1 (the reference contract).

    group_plan (optional, static tuple of per-pass bit counts summing to the
    position count, each 1..6) overrides the grouping policy — the knob the
    wide-field full-width pricing lab turns (proto/widefield_full_lab.py);
    None means the measured default (4-bit passes, one wide pass at 5-6
    total bits)."""
    interp = interpret_mode()
    payloads = list(payloads)
    ns = len(payloads)
    n = keys.shape[0]
    if bit_positions is None:
        positions = tuple(range(num_steps * RADIX_BITS))
    else:
        positions = tuple(int(b) for b in bit_positions)
    if not positions:
        return keys, payloads  # zero sort bits: the identity permutation
    if group_plan is not None:
        sizes = tuple(int(s) for s in group_plan)
        if sum(sizes) != len(positions) or not all(1 <= s <= 6 for s in sizes):
            raise ValueError("group_plan must partition the bit positions into 1..6-bit passes")
        groups, i = [], 0
        for s in sizes:
            groups.append(positions[i : i + s])
            i += s
    elif FIELD_BITS < len(positions) <= 6:
        # wide-field single pass: 5-6 sort bits (the distributed bucket
        # partition at 16 < D <= 64, and 5-6-bit adaptive sorts) group in
        # ONE pass of up to 64 bins — same split count, but ONE splice
        # instead of two (measured at 67M, 3 streams: D=32 partition
        # 1.398 -> 0.981 ns/key, D=64 1.392 -> 1.161;
        # proto/partition_lab.py). Capped at 6: the 128-bin counts row
        # (2**7 sequential bin reductions) compiles/runs pathologically —
        # 7+ bits take the standard 4-bit passes
        groups = [positions]
    else:
        groups = [positions[i : i + FIELD_BITS] for i in range(0, len(positions), FIELD_BITS)]
    fields = 1 << max(len(g) for g in groups)
    R = _choose_block_rows(n, fields)
    S = R * LANES
    padded = -(-n // S) * S
    num_blocks = padded // S
    total_rows = padded // LANES
    vlog(
        "radix_sort n=%d: R=%d blocks=%d streams=%d passes=%d fields=%d splice_runs/pass=%d",
        n, R, num_blocks, ns, len(groups), fields,
        num_blocks * fields if num_blocks > 1 else 0,
    )

    kp = jnp.pad(keys, (0, padded - n), constant_values=jnp.uint32(0xFFFFFFFF))
    vps = [jnp.pad(v, (0, padded - n)) for v in payloads]

    k2 = kp.reshape(total_rows, LANES)
    v2s = [vp.reshape(total_rows, LANES) for vp in vps]

    if num_blocks == 1 and R <= _FUSE_MAX_R:
        # small single block: the whole sort fuses into ONE kernel — no
        # splices, no per-pass glue (bit-by-bit LSD = 4-bit-by-4-bit LSD)
        k2, v2s = _single_block_sort(k2, v2s, R, positions, interp)
        return k2.reshape(-1)[:n], [v.reshape(-1)[:n] for v in v2s]
    if num_blocks == 1:
        # one max-size block: per-pass grouping, splice is the identity
        # (the fused form compiles to much slower code at R=1024)
        for g in groups:
            pos_arr = jnp.array(g, dtype=jnp.int32)
            k2, v2s, _ = _group_pass(pos_arr, k2, v2s, R, interp, nbits=len(g))
        return k2.reshape(-1)[:n], [v.reshape(-1)[:n] for v in v2s]

    # splicer slack rows are allocated ONCE and carried through all passes
    # (re-padding each pass would copy the full arrays 2x per pass); the
    # slack region holds garbage and is excluded from the group grid and
    # from the final slice. Chunk geometry is sized PER PASS to that pass's
    # bin count (a mixed plan's 4-bit passes keep their typical-run-sized
    # chunks rather than inheriting the widest pass's tighter cap); the
    # shared slack takes the max any pass needs.
    ch_rd = [_chunk_rows(R, 1 << len(g)) for g in groups]
    slack = max(_slack_rows(ch, rd) for ch, rd in ch_rd)
    rows_slacked = total_rows + slack
    k2 = jnp.pad(k2, ((0, slack), (0, 0)))
    v2s = [jnp.pad(v, ((0, slack), (0, 0))) for v in v2s]

    for g, (ch, rd) in zip(groups, ch_rd):
        pos_arr = jnp.array(g, dtype=jnp.int32)
        gk, gvs, counts = _group_pass(pos_arr, k2, v2s, R, interp, num_blocks, nbits=len(g))
        srcs, dsts, lens, nruns = _run_descriptors(counts, R)
        spliced = _splice_streams(srcs, dsts, lens, nruns, [gk] + gvs, rows_slacked, ch, rd, interp)
        k2, v2s = spliced[0], spliced[1:]

    out_k = k2[:total_rows].reshape(-1)[:n]
    out_vs = [v[:total_rows].reshape(-1)[:n] for v in v2s]
    return out_k, out_vs


def pallas_radix_sort(keys: jax.Array, values, num_steps: int):
    """Stable LSD radix sort of u32 keys (+ optional u32 values), k 4-bit
    passes (reference operator() semantics, RadixSort.hpp:273)."""
    if values is None:
        out_k, _ = pallas_radix_sort_streams(keys, [], num_steps)
        return out_k, None
    out_k, out_vs = pallas_radix_sort_streams(keys, [values], num_steps)
    return out_k, out_vs[0]
