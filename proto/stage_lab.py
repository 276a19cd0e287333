"""Production-pipeline stage timing at scale: group vs splice vs glue.

Times, with chained iterations at 64 blocks (8.4M elems, R=1024):
  group   — production _group_pass (with counts) per 4-bit pass
  split4  — 4 bit-splits only, no counts (group minus counts)
  splice  — production _splice_streams over realistic descriptors
  glue    — _run_descriptors alone
  pass    — one full production pass (group + glue + splice)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from glu_tpu.ops import _pallas_sort as ps

R = 1024
LANES = 128
NB = 64
N = NB * R * LANES


def fence(x):
    np.asarray(jax.tree.leaves(x)[0][:1])


def chain_time(fn, args, iters=8):
    def chained(it):
        @jax.jit
        def g(state):
            return jax.lax.fori_loop(0, it, lambda i, s: fn(*s), state)
        return g
    g1, gn = chained(1), chained(1 + iters)
    fence(g1(args)); fence(gn(args))
    def t(g):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); fence(g(args)); best = min(best, time.perf_counter() - t0)
        return best
    return (t(gn) - t(g1)) / iters


def main():
    want = sys.argv[1:] or ["group", "splice", "glue", "pass"]
    rng = np.random.default_rng(1)
    slack = ps._slack_rows(*ps._chunk_rows(R))
    rows = NB * R
    k2 = jnp.asarray(
        np.vstack([rng.integers(0, 1 << 32, (rows, LANES), dtype=np.uint32),
                   np.zeros((slack, LANES), np.uint32)]))
    v2 = jnp.asarray(
        np.vstack([np.arange(N, dtype=np.uint32).reshape(rows, LANES),
                   np.zeros((slack, LANES), np.uint32)]))
    shift = jnp.array([0, 1, 2, 3], dtype=jnp.int32)  # pass-0 bit positions

    if "group" in want:
        def fn(k, v):
            gk, gvs, cnt = ps._group_pass(shift, k, [v], R, False, NB)
            return gk, gvs[0]
        t = chain_time(fn, (k2, v2))
        print(f"group : {t*1e3:8.3f} ms/pass  {t/N*1e12:6.1f} ps/elem", flush=True)

    if "splice" in want:
        gk, gvs, cnt = ps._group_pass(shift, k2, [v2], R, False, NB)
        gv = gvs[0]
        srcs, dsts, lens, nruns_d = ps._run_descriptors(cnt, R)
        def fn(a, b):
            ch, rd = ps._chunk_rows(R)
            return tuple(ps._splice_streams(srcs, dsts, lens, nruns_d, [a, b], rows + slack, ch, rd, False))
        t = chain_time(fn, (gk, gv))
        nruns = int(srcs.shape[0])
        print(f"splice: {t*1e3:8.3f} ms/pass  {t/N*1e12:6.1f} ps/elem  "
              f"({nruns} runs, {t/nruns*1e9:.0f} ns/run)", flush=True)

    if "glue" in want:
        gk, gvs, cnt = ps._group_pass(shift, k2, [v2], R, False, NB)
        def fn(c):
            s, d, l, nr = ps._run_descriptors(c, R)
            return (s + d + l + nr,)
        t = chain_time(lambda c: fn(c), (cnt,))
        print(f"glue  : {t*1e3:8.3f} ms/pass  {t/N*1e12:6.1f} ps/elem", flush=True)

    if "pass" in want:
        def fn(k, v):
            gk, gvs, cnt = ps._group_pass(shift, k, [v], R, False, NB)
            s, d, l, nr = ps._run_descriptors(cnt, R)
            ch, rd = ps._chunk_rows(R)
            return tuple(ps._splice_streams(s, d, l, nr, [gk] + gvs, rows + slack, ch, rd, False))
        t = chain_time(fn, (k2, v2))
        print(f"pass  : {t*1e3:8.3f} ms/pass  {t/N*1e12:6.1f} ps/elem "
              f"-> {1/(8*t/N)/1e6:.1f} M keys/s whole-sort-equiv", flush=True)


if __name__ == "__main__":
    main()
