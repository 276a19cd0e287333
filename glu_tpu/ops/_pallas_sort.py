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

from ._pallas_common import interpret_mode, narrow_cumsum_incl
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
CH_ROWS = 72                   # covers a typical run (BLOCK_R/FIELDS rows) + misaligned boundary
_READ_ROWS = CH_ROWS + 8       # DMA read size (sublane-aligned, covers CH+1 rows)
_FUSE_MAX_R = 512              # largest single block the fused whole-sort kernel handles


def _slack_rows() -> int:
    """Splicer src/dst over-read/-write padding (derived from live geometry)."""
    return 2 * CH_ROWS + _READ_ROWS


def _lanes(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _rows(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)


def _inrow_cumsum(x):
    lanes = _lanes(x.shape)
    s = 1
    while s < LANES:
        x = x + jnp.where(lanes >= s, pltpu.roll(x, s, axis=x.ndim - 1), 0)
        s *= 2
    return x


def _col_cumsum_incl(x, rows_n):
    rows = _rows(x.shape)
    s = 1
    while s < rows_n:
        x = x + jnp.where(rows >= s, pltpu.roll(x, s, axis=x.ndim - 2), 0)
        s *= 2
    return x


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


def _split_round(k, v, bit):
    """One stable 1-bit split of a (R, 128) block in row-major order."""
    R = k.shape[0]
    lanes = _lanes((R, LANES))
    rows = _rows((R, LANES))
    z = 1 - bit
    cumZ = _packed4_inrow_cumsum(z)               # inclusive zeros per row
    c0 = cumZ[:, LANES - 1 : LANES]               # (R,1)
    Zin = narrow_cumsum_incl(c0, R)
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
    gv = jnp.take_along_axis(v, lo, axis=1) if v is not None else None

    # b. route to final lane + dest-row tag
    def route(Fc, base, cnt):
        rank = (lanes - Fc) & (LANES - 1)   # floor-mod: & works for negatives
        src = jnp.clip(base + rank, 0, LANES - 1)
        rk = jnp.take_along_axis(gk, src, axis=1)
        rv = jnp.take_along_axis(gv, src, axis=1) if gv is not None else None
        valid = rank < cnt
        q = (Fc >> 7) + jnp.where(lanes < (Fc & (LANES - 1)), 1, 0)
        # flagless meta: remaining row delta only (0 = inert). A valid
        # element with delta 0 is already home and behaves identically to
        # an empty slot in the walk, so no occupancy flag is needed.
        meta = jnp.where(valid, jnp.abs(q - rows), 0)
        return rk, rv, meta

    # c. masked sublane log-shift to dest rows
    def colshift(rk, rv, meta, up):
        s = 1
        while s < R:
            t = (R - s) % R if up else s          # roll: row r -> row r+t
            rk_s = pltpu.roll(rk, t, axis=0)
            m_s = pltpu.roll(meta, t, axis=0)
            arrive = (m_s & s) != 0
            stay = (meta & s) == 0
            rk = jnp.where(arrive, rk_s, rk)
            if rv is not None:
                rv = jnp.where(arrive, pltpu.roll(rv, t, axis=0), rv)
            meta = jnp.where(arrive, m_s - s, jnp.where(stay, meta, 0))
            s *= 2
        return rk, rv

    zk, zv, zmeta = route(Zex, jnp.zeros((R, 1), jnp.int32), c0)
    ok_, ov_, ometa = route(jnp.int32(n0) + Oex, c0, LANES - c0)
    zk, zv = colshift(zk, zv, zmeta, up=True)
    ok_, ov_ = colshift(ok_, ov_, ometa, up=False)
    sel = (rows * LANES + lanes) < n0
    out_k = jnp.where(sel, zk, ok_)
    out_v = jnp.where(sel, zv, ov_) if v is not None else None
    return out_k, out_v


def _group_block(k, v, shift):
    """Group a (R,128) block stably by its FIELD_BITS-bit field at `shift`
    (LSB-first splits)."""
    for b in range(FIELD_BITS):
        bit = ((k >> (shift + jnp.uint32(b))) & jnp.uint32(1)).astype(jnp.int32)
        k, v = _split_round(k, v, bit)
    return k, v


def _counts_row(k, shift):
    """FIELDS-bin field histogram of a block, laid into an (8,128) tile
    (row 0, lanes 0..FIELDS-1) — the Mosaic-aligned counts output."""
    digit = (k >> shift) & jnp.uint32(FIELDS - 1)
    rows8 = _rows((8, LANES))
    lanes8 = _lanes((8, LANES))
    res = jnp.zeros((8, LANES), jnp.int32)
    for d in range(FIELDS):
        c = jnp.sum((digit == jnp.uint32(d)).astype(jnp.int32))
        res = res + jnp.where((rows8 == 0) & (lanes8 == d), c, 0)
    return res


def _group_pass(shift_arr, keys2d, values2d, R, interpret, num_blocks=None):
    """K1: returns (grouped keys, grouped values | None, counts (B, FIELDS)).
    keys2d may carry trailing slack rows (excluded via num_blocks); grid
    steps only touch rows [0, num_blocks*R), the slack region passes
    through unwritten (don't-care for the splicer's over-reads)."""
    if num_blocks is None:
        num_blocks = keys2d.shape[0] // R
    data_spec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    data_shape = jax.ShapeDtypeStruct(keys2d.shape, jnp.uint32)
    cnt_shape = jax.ShapeDtypeStruct((num_blocks, 8, LANES), jnp.int32)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    if values2d is not None:

        def kernel(shift_ref, k_ref, v_ref, ok_ref, ov_ref, cnt_ref):
            shift = shift_ref[0].astype(jnp.uint32)
            k, v = _group_block(k_ref[:], v_ref[:], shift)
            ok_ref[:] = k
            ov_ref[:] = v
            cnt_ref[0] = _counts_row(k, shift)

        ok, ov, cnt = pl.pallas_call(
            kernel,
            grid=(num_blocks,),
            in_specs=[smem, data_spec, data_spec],
            out_specs=[data_spec, data_spec, cnt_spec],
            out_shape=[data_shape, data_shape, cnt_shape],
            interpret=interpret,
            compiler_params=params,
        )(shift_arr, keys2d, values2d)
        return ok, ov, cnt[:, 0, :FIELDS]

    def kernel_k(shift_ref, k_ref, ok_ref, cnt_ref):
        shift = shift_ref[0].astype(jnp.uint32)
        k, _ = _group_block(k_ref[:], None, shift)
        ok_ref[:] = k
        cnt_ref[0] = _counts_row(k, shift)

    ok, cnt = pl.pallas_call(
        kernel_k,
        grid=(num_blocks,),
        in_specs=[smem, data_spec],
        out_specs=[data_spec, cnt_spec],
        out_shape=[data_shape, cnt_shape],
        interpret=interpret,
        compiler_params=params,
    )(shift_arr, keys2d)
    return ok, None, cnt[:, 0, :FIELDS]


def _splice_kernel_body(s_ref, d_ref, l_ref, ksrc_ref, vsrc_ref, kdst_ref, vdst_ref,
                        kbuf, vbuf, kout, vout, kcarry, vcarry,
                        sem_rd, sem_wr, sem_x):
    """Copy run i (grid step i) of BOTH streams: flat [src, src+len) ->
    flat [dst, dst+len) for keys and values with shared descriptors.

    Software-pipelined across the sequential grid: step i consumes the
    reads issued at step i-1 (double-buffered slots), issues run i+1's
    reads before waiting on its own writes, and defers its write completion
    to step i+1 (which must wait anyway before touching the shared
    boundary row). Every step issues exactly one read pair and one write
    pair (dummy transfers into the slack region for empty runs) so the
    semaphore accounting is static. Runs longer than CH_ROWS fall back to
    an inline serial path for their extra chunks (sem_x).

    Index algebra: delta = dst - src, rot = delta mod 128,
    dq = (delta - rot)/128. Output row j, lane l takes
    src[(dst_row + j) - dq - (1 if l < rot else 0), (l - rot) mod 128].
    Reads cover _READ_ROWS source rows starting one row before the first
    needed hi row; when that pre-row would be source row -1 the read clamps
    to 0 and the lo tile is realigned by a one-row roll (see `tiles`).
    Writes are
    whole CH_ROWS chunks; spill beyond the run's end is rewritten by later
    runs (ascending dst order) or lands in padded slack. kcarry/vcarry hold
    the previous run's last output row for the boundary merge.
    """
    i = pl.program_id(0)
    nruns = pl.num_programs(0)
    slack_row = kdst_ref.shape[0] - CH_ROWS  # dummy-write target in slack

    def read_chunk_start(run, slot):
        src = s_ref[run]
        dst = d_ref[run]
        ln = l_ref[run]
        dq = (dst - src - (dst - src) % LANES) // LANES
        hi0 = dst // LANES - dq
        rd0 = jnp.where(ln > 0, jnp.maximum(hi0 - 1, 0), 0)
        pltpu.make_async_copy(
            ksrc_ref.at[pl.ds(rd0, _READ_ROWS), :], kbuf.at[slot], sem_rd.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            vsrc_ref.at[pl.ds(rd0, _READ_ROWS), :], vbuf.at[slot], sem_rd.at[slot, 1]
        ).start()

    def read_chunk_wait(run, slot):
        src = s_ref[run]
        dst = d_ref[run]
        ln = l_ref[run]
        dq = (dst - src - (dst - src) % LANES) // LANES
        hi0 = dst // LANES - dq
        rd0 = jnp.where(ln > 0, jnp.maximum(hi0 - 1, 0), 0)
        pltpu.make_async_copy(
            ksrc_ref.at[pl.ds(rd0, _READ_ROWS), :], kbuf.at[slot], sem_rd.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            vsrc_ref.at[pl.ds(rd0, _READ_ROWS), :], vbuf.at[slot], sem_rd.at[slot, 1]
        ).wait()

    def write_wait(slot):
        pltpu.make_async_copy(
            kout.at[slot], kdst_ref.at[pl.ds(slack_row, CH_ROWS), :], sem_wr.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            vout.at[slot], vdst_ref.at[pl.ds(slack_row, CH_ROWS), :], sem_wr.at[slot, 1]
        ).wait()

    slot = i % 2

    @pl.when(i == 0)
    def _():
        read_chunk_start(0, 0)

    read_chunk_wait(i, slot)

    # prefetch next run's read before stalling on anything else
    @pl.when(i + 1 < nruns)
    def _():
        read_chunk_start(i + 1, (i + 1) % 2)

    src = s_ref[i]
    dst = d_ref[i]
    ln = l_ref[i]
    delta = dst - src
    rot = delta % LANES
    dq = (delta - rot) // LANES
    dst_r0 = dst // LANES
    dst_l0 = dst % LANES
    n_out_rows = (dst_l0 + ln + LANES - 1) // LANES
    nchunks = (n_out_rows + CH_ROWS - 1) // CH_ROWS
    lanes2 = _lanes((CH_ROWS, LANES))
    rows2 = _rows((CH_ROWS, LANES))
    idx = (lanes2 - rot) % LANES

    def rotate(tile_hi, tile_lo, carry, is_first):
        a = jnp.take_along_axis(tile_hi, idx, axis=1)
        b = jnp.take_along_axis(tile_lo, idx, axis=1)
        out = jnp.where(lanes2 >= rot, a, b)
        return jnp.where(is_first & (rows2 == 0) & (lanes2 < dst_l0), carry[0], out)

    def tiles(buf, slot_, base_):
        """(hi, lo) tiles with lo[j] = hi[j-1]. When the read window starts
        at source row 0 (base_ == 0, the pre-window row doesn't exist), the
        clamped second slice would alias hi — realign it with a one-row
        roll instead; its row 0 is garbage, but row 0's lanes < rot are
        always masked there (hi0 == 0 forces dst_l0 >= rot, so the carry
        merge covers them)."""
        hi = buf[slot_, pl.ds(base_, CH_ROWS), :]
        lo_raw = buf[slot_, pl.ds(jnp.maximum(base_ - 1, 0), CH_ROWS), :]
        lo = jnp.where(base_ > 0, lo_raw, pltpu.roll(lo_raw, 1, axis=0))
        return hi, lo

    # --- chunk 0 (pipelined) --------------------------------------------
    # compute BEFORE waiting the previous write: pure VPU work
    src0 = s_ref[i]
    hi0 = dst_r0 - dq
    rd0 = jnp.maximum(hi0 - 1, 0)
    base = hi0 - rd0

    def first_chunk(buf, carry):
        hi, lo_ = tiles(buf, slot, base)
        return rotate(hi, lo_, carry, ln > 0)

    k0 = first_chunk(kbuf, kcarry)
    v0 = first_chunk(vbuf, vcarry)
    kout[slot] = k0
    vout[slot] = v0
    last0 = n_out_rows - 1

    @pl.when((ln > 0) & (last0 < CH_ROWS))
    def _():
        kcarry[0] = kout[slot, last0, :]
        vcarry[0] = vout[slot, last0, :]

    # previous step's write must complete before we touch the shared
    # boundary row (and before slot reuse)
    @pl.when(i > 0)
    def _():
        write_wait(1 - slot)

    wrow = jnp.where(ln > 0, dst_r0, slack_row)
    pltpu.make_async_copy(
        kout.at[slot], kdst_ref.at[pl.ds(wrow, CH_ROWS), :], sem_wr.at[slot, 0]
    ).start()
    pltpu.make_async_copy(
        vout.at[slot], vdst_ref.at[pl.ds(wrow, CH_ROWS), :], sem_wr.at[slot, 1]
    ).start()

    # --- extra chunks (serial path, rare: run longer than CH_ROWS) -------
    @pl.when(nchunks > 1)
    def _():
        def chunk_body(c, _):
            hi0c = dst_r0 + c * CH_ROWS - dq
            rd0c = jnp.maximum(hi0c - 1, 0)
            basec = hi0c - rd0c
            rk = pltpu.make_async_copy(
                ksrc_ref.at[pl.ds(rd0c, _READ_ROWS), :], kbuf.at[2], sem_x.at[0]
            )
            rv = pltpu.make_async_copy(
                vsrc_ref.at[pl.ds(rd0c, _READ_ROWS), :], vbuf.at[2], sem_x.at[1]
            )
            rk.start(); rv.start(); rk.wait(); rv.wait()

            def mk(buf):
                hi, lo_ = tiles(buf, 2, basec)
                return rotate(hi, lo_, kcarry, False)

            kc = mk(kbuf)
            vc_hi, vc_lo = tiles(vbuf, 2, basec)
            vc = jnp.where(lanes2 >= rot, jnp.take_along_axis(vc_hi, idx, axis=1),
                           jnp.take_along_axis(vc_lo, idx, axis=1))
            kout[2] = kc
            vout[2] = vc
            lastc = last0 - c * CH_ROWS

            @pl.when((lastc >= 0) & (lastc < CH_ROWS))
            def _():
                kcarry[0] = kout[2, lastc, :]
                vcarry[0] = vout[2, lastc, :]

            wk = pltpu.make_async_copy(
                kout.at[2], kdst_ref.at[pl.ds(dst_r0 + c * CH_ROWS, CH_ROWS), :], sem_x.at[2]
            )
            wv = pltpu.make_async_copy(
                vout.at[2], vdst_ref.at[pl.ds(dst_r0 + c * CH_ROWS, CH_ROWS), :], sem_x.at[3]
            )
            wk.start(); wv.start(); wk.wait(); wv.wait()
            return 0

        jax.lax.fori_loop(1, nchunks, chunk_body, 0)

    # drain the last step's own write
    @pl.when(i == nruns - 1)
    def _():
        write_wait(slot)


def _splice_kv(srcs, dsts, lens, flat_k, flat_v, total_rows, interpret):
    """K2: sequential run splicer over both streams. flat_k/flat_v:
    (rows, 128) padded sources. Returns spliced (keys, values)."""
    nruns = srcs.shape[0]
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = jax.ShapeDtypeStruct((total_rows, LANES), jnp.uint32)
    ok, ov = pl.pallas_call(
        _splice_kernel_body,
        grid=(nruns,),
        in_specs=[smem, smem, smem, anyspec, anyspec],
        out_specs=[anyspec, anyspec],
        out_shape=[out_shape, out_shape],
        scratch_shapes=[
            pltpu.VMEM((3, _READ_ROWS, LANES), jnp.uint32),   # k read bounce (2 pipelined + 1 serial)
            pltpu.VMEM((3, _READ_ROWS, LANES), jnp.uint32),   # v read bounce
            pltpu.VMEM((3, CH_ROWS, LANES), jnp.uint32),      # k write bounce
            pltpu.VMEM((3, CH_ROWS, LANES), jnp.uint32),      # v write bounce
            pltpu.VMEM((8, LANES), jnp.uint32),               # k carry (row 0)
            pltpu.VMEM((8, LANES), jnp.uint32),               # v carry (row 0)
            pltpu.SemaphoreType.DMA((2, 2)),                  # pipelined reads
            pltpu.SemaphoreType.DMA((2, 2)),                  # pipelined writes
            pltpu.SemaphoreType.DMA((4,)),                    # serial extra chunks
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(srcs, dsts, lens, flat_k, flat_v)
    return ok, ov


def _splice_k(srcs, dsts, lens, flat_k, total_rows, interpret):
    """Keys-only splicer (values=None path): reuses the fused kernel with
    the key stream duplicated — simple and rarely the hot path."""
    ok, _ = _splice_kv(srcs, dsts, lens, flat_k, flat_k, total_rows, interpret)
    return ok


def _run_descriptors(counts, R):
    """counts: (B, 16) per-block digit counts. Returns (srcs, dsts, lens)
    flat run descriptors in bucket-major (ascending dst) order — the glue
    replacing the reference's BlellochScan over [digit][block]
    (RadixSort.hpp:311)."""
    B = counts.shape[0]
    inblock = jnp.cumsum(counts, axis=1) - counts            # (B,FIELDS) src offset in block
    srcs = (jnp.arange(B, dtype=jnp.int32)[:, None] * (R * LANES) + inblock).T.reshape(-1)
    per_digit = jnp.cumsum(counts, axis=0) - counts          # (B,FIELDS) excl over blocks
    totals = jnp.sum(counts, axis=0)
    digit_base = jnp.cumsum(totals) - totals                 # (FIELDS,)
    dsts = (digit_base[None, :] + per_digit).T.reshape(-1)
    lens = counts.T.reshape(-1)
    return srcs.astype(jnp.int32), dsts.astype(jnp.int32), lens.astype(jnp.int32)


def _choose_block_rows(n: int) -> int:
    """Pick the block height: smallest power-of-two row count whose block
    covers n, capped at BLOCK_R (VMEM budget)."""
    rows = max(8, -(-n // LANES))
    r = 8
    while r < rows and r < BLOCK_R:
        r *= 2
    return r


def _single_block_sort(shift_unused, keys2d, values2d, R, num_steps, interpret):
    """Fused path for single-block inputs: all num_steps*FIELD-bit splits in
    ONE kernel invocation (the splice is the identity when there is only one
    block, so the whole LSD sort collapses into one VMEM-resident kernel —
    8 dispatch+glue round trips fewer than the general path; the analog of
    how the reference's small sorts are dominated by its per-pass dispatch
    overhead, README.md:120-125)."""
    nbits = num_steps * RADIX_BITS

    def kernel(k_ref, v_ref, ok_ref, ov_ref):
        def body(b, kv):
            k, v = kv
            bit = ((k >> b.astype(jnp.uint32)) & jnp.uint32(1)).astype(jnp.int32)
            return _split_round(k, v, bit)

        k, v = jax.lax.fori_loop(0, nbits, body, (k_ref[:], v_ref[:]))
        ok_ref[:] = k
        ov_ref[:] = v

    def kernel_k(k_ref, ok_ref):
        def body(b, k):
            bit = ((k >> b.astype(jnp.uint32)) & jnp.uint32(1)).astype(jnp.int32)
            return _split_round(k, None, bit)[0]

        ok_ref[:] = jax.lax.fori_loop(0, nbits, body, k_ref[:])

    spec = pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct(keys2d.shape, jnp.uint32)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if values2d is not None:
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[shape, shape],
            interpret=interpret,
            compiler_params=params,
        )(keys2d, values2d)
    out = pl.pallas_call(
        kernel_k,
        grid=(1,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=shape,
        interpret=interpret,
        compiler_params=params,
    )(keys2d)
    return out, None


def pallas_radix_sort(keys: jax.Array, values, num_steps: int):
    """Stable LSD radix sort of u32 keys (+ optional u32 values), k 4-bit
    passes (reference operator() semantics, RadixSort.hpp:273)."""
    interp = interpret_mode()
    n = keys.shape[0]
    R = _choose_block_rows(n)
    S = R * LANES
    padded = -(-n // S) * S
    num_blocks = padded // S
    total_rows = padded // LANES
    vlog(
        "radix_sort n=%d: R=%d blocks=%d passes=%d splice_runs/pass=%d",
        n, R, num_blocks, num_steps * (RADIX_BITS // FIELD_BITS),
        num_blocks * FIELDS if num_blocks > 1 else 0,
    )

    kp = jnp.pad(keys, (0, padded - n), constant_values=jnp.uint32(0xFFFFFFFF))
    vp = jnp.pad(values, (0, padded - n)) if values is not None else None

    k2 = kp.reshape(total_rows, LANES)
    v2 = vp.reshape(total_rows, LANES) if vp is not None else None

    if num_blocks == 1 and R <= _FUSE_MAX_R:
        # small single block: the whole sort fuses into ONE kernel — no
        # splices, no per-pass glue (bit-by-bit LSD = 4-bit-by-4-bit LSD)
        k2, v2 = _single_block_sort(None, k2, v2, R, num_steps, interp)
        out_k = k2.reshape(-1)[:n]
        out_v = v2.reshape(-1)[:n] if v2 is not None else None
        return out_k, out_v
    if num_blocks == 1:
        # one max-size block: per-pass grouping, splice is the identity
        # (the fused form compiles to much slower code at R=1024)
        internal_passes = num_steps * (RADIX_BITS // FIELD_BITS)
        for step in range(internal_passes):
            shift_arr = jnp.array([step * FIELD_BITS], dtype=jnp.int32)
            k2, v2, _ = _group_pass(shift_arr, k2, v2, R, interp)
        out_k = k2.reshape(-1)[:n]
        out_v = v2.reshape(-1)[:n] if v2 is not None else None
        return out_k, out_v

    # splicer slack rows are allocated ONCE and carried through all passes
    # (re-padding each pass would copy the full arrays 2x per pass); the
    # slack region holds garbage and is excluded from the group grid and
    # from the final slice.
    slack = _slack_rows()
    rows_slacked = total_rows + slack
    k2 = jnp.pad(k2, ((0, slack), (0, 0)))
    v2 = jnp.pad(v2, ((0, slack), (0, 0))) if v2 is not None else None

    internal_passes = num_steps * (RADIX_BITS // FIELD_BITS)
    for step in range(internal_passes):
        shift_arr = jnp.array([step * FIELD_BITS], dtype=jnp.int32)
        gk, gv, counts = _group_pass(shift_arr, k2, v2, R, interp, num_blocks)
        srcs, dsts, lens = _run_descriptors(counts, R)
        if gv is not None:
            k2, v2 = _splice_kv(srcs, dsts, lens, gk, gv, rows_slacked, interp)
        else:
            k2 = _splice_k(srcs, dsts, lens, gk, rows_slacked, interp)

    out_k = k2[:total_rows].reshape(-1)[:n]
    out_v = v2[:total_rows].reshape(-1)[:n] if v2 is not None else None
    return out_k, out_v
