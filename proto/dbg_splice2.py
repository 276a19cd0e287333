"""Reproduce pass-6 state in numpy and inspect run descriptors near flat 256."""
import numpy as np

R, LANES, FIELDS = 16, 128, 16
n = 4100
rng = np.random.Generator(np.random.PCG64(4100))
keys = rng.integers(0, 0xFFFFFFFF, size=n, dtype=np.uint32)
vals = np.arange(n, dtype=np.uint32)

S = R * LANES
padded = -(-n // S) * S
B = padded // S
kp = np.concatenate([keys, np.full(padded - n, 0xFFFFFFFF, dtype=np.uint32)])
vp = np.concatenate([vals, np.zeros(padded - n, dtype=np.uint32)])

# state before internal pass idx 5 (shift=20): stable sort by low 20 bits
order = np.argsort(kp & np.uint32((1 << 20) - 1), kind="stable")
k5, v5 = kp[order], vp[order]

shift = 20
# group each block stably by digit, compute counts
counts = np.zeros((B, FIELDS), dtype=np.int64)
gk = k5.copy()
for b in range(B):
    blk = k5[b * S : (b + 1) * S]
    d = (blk >> shift) & 0xF
    counts[b] = np.bincount(d, minlength=16)

inblock = np.cumsum(counts, axis=1) - counts
srcs = (np.arange(B)[:, None] * S + inblock).T.reshape(-1)
per_digit = np.cumsum(counts, axis=0) - counts
totals = counts.sum(axis=0)
digit_base = np.cumsum(totals) - totals
dsts = (digit_base[None, :] + per_digit).T.reshape(-1)
lens = counts.T.reshape(-1)

# find runs whose dst region covers flat 200..400
for i in range(len(srcs)):
    if dsts[i] + lens[i] >= 200 and dsts[i] <= 400:
        src, dst, ln = srcs[i], dsts[i], lens[i]
        delta = dst - src
        rot = delta % LANES
        dq = (delta - rot) // LANES
        dst_r0, dst_l0 = dst // LANES, dst % LANES
        n_out = (dst_l0 + ln + LANES - 1) // LANES
        print(f"run {i:3d}: src={src:6d} dst={dst:6d} len={ln:5d} "
              f"dst_r0={dst_r0:3d} dst_l0={dst_l0:3d} rot={rot:3d} dq={dq:3d} "
              f"n_out_rows={n_out} src_l0={src % LANES}")
