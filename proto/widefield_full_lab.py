"""Full-width wide-field grouping lab (round 5, engine idea pricing).

The wide-field pass (5-6 sort bits -> one pass of up to 64 bins + ONE
splice) shipped for the distributed bucket partition and 5-6-bit adaptive
sorts. The open question it left: does grouping the FULL 32-bit sort into
5-6-bit passes beat the shipped 8x4? The ledger both ways:

  + a 6-pass plan (6,6,6,6,4,4) runs 6 splices instead of 8 (the
    partition lab priced one splice at ~0.14 ns/key/array);
  - 64-bin passes force taller blocks (R 512 -> 2048-4096), adding
    log2(R) sublane steps to every one of the 32 bit-splits (~0.1
    ns/key per step, the r04 512-row measurement), and the 64-bin
    counts row does 4x the sequential bin reductions.

Measures: 268M and 67M kv + keys-only under each plan, single fenced
calls (the fence floor is noise at these sizes), fresh donatable buffers
per rep, device-side verification once per plan.

Usage: python proto/widefield_full_lab.py [log2_n]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _fence_floor, _rand_u32, _sync
from glu_tpu.ops._pallas_sort import pallas_radix_sort_streams

PLANS = {
    "8x4 (ship)": None,
    "6,6,6,6,4,4": (6, 6, 6, 6, 4, 4),
    "4,4,6,6,6,6": (4, 4, 6, 6, 6, 6),
    "6,6,5,5,5,5": (6, 6, 5, 5, 5, 5),
    "5,5,5,5,4,4,4": (5, 5, 5, 5, 4, 4, 4),
    "6,6,6,6,6,2": (6, 6, 6, 6, 6, 2),
}


@partial(jax.jit, static_argnames=("plan", "ns"), donate_argnums=(0, 1))
def _sort(k, vs, plan, ns):
    ok, ovs = pallas_radix_sort_streams(k, list(vs), 8, None, plan)
    return ok, tuple(ovs)


def run(n, ns, plan, reps=3):
    keys = _rand_u32(n, 1)
    vals = tuple(jnp.arange(n, dtype=jnp.uint32) for _ in range(ns))
    ok, ovs = _sort(jnp.copy(keys), tuple(jnp.copy(v) for v in vals), plan, ns)
    _sync(ok)
    sorted_ok = bool(jnp.all(ok[1:] >= ok[:-1]))
    chk = bool(jnp.sum(ok, dtype=jnp.uint32) == jnp.sum(keys, dtype=jnp.uint32))
    perm_ok = True
    if ns:
        back = ok[jnp.argsort(ovs[0])] if n <= 1 << 26 else None
        perm_ok = bool(jnp.all(back == keys)) if back is not None else bool(
            jnp.sum(ovs[0], dtype=jnp.uint32) == jnp.sum(vals[0], dtype=jnp.uint32)
        )
    best = float("inf")
    for _ in range(reps):
        k = jnp.copy(keys)
        vs = tuple(jnp.copy(v) for v in vals)
        _sync(k)
        for v in vs:
            _sync(v)
        t0 = time.perf_counter()
        _sync(_sort(k, vs, plan, ns))
        best = min(best, time.perf_counter() - t0)
    best = max(best - _fence_floor(), 1e-9)
    return best, sorted_ok and chk and perm_ok


def main():
    # usage: widefield_full_lab.py [log2_n] [kv|keys|both] [plan-substr ...]
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    want = sys.argv[3:]
    plans = {
        k: v for k, v in PLANS.items() if not want or any(w in k for w in want)
    }
    modes = {"kv": ((1, "kv"),), "keys": ((0, "keys"),)}.get(
        mode, ((1, "kv"), (0, "keys"))
    )
    for n in (1 << lg,):
        for ns, tag in modes:
            print(f"n=2^{n.bit_length() - 1} {tag}:", flush=True)
            for name, plan in plans.items():
                try:
                    t, ok = run(n, ns, plan)
                except Exception as e:  # noqa: BLE001 - lab prints and moves on
                    print(f"  {name:16s} FAILED: {type(e).__name__}: {e}", flush=True)
                    continue
                print(
                    f"  {name:16s} {t / n * 1e9:6.3f} ns/key  "
                    f"{n / t / 1e6:7.1f} M keys/s  verify={'OK' if ok else 'BAD'}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
