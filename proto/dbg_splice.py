"""Debug: multi-block splicer at shrunk geometry, pass-by-pass oracle diff."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["GLU_TPU_PALLAS_INTERPRET"] = "1"
import numpy as np
import jax.numpy as jnp

from glu_tpu.ops import _pallas_sort as ps

ps.BLOCK_R = 16
ps.CH_ROWS = 8
ps._READ_ROWS = 16

rng = np.random.Generator(np.random.PCG64(4100))
n = 4100
keys = rng.integers(0, 0xFFFFFFFF, size=n, dtype=np.uint32)
vals = np.arange(n, dtype=np.uint32)

# run pass-by-pass via num_steps and compare to masked stable oracle
for steps in range(1, 9):
    out_k, out_v = ps.pallas_radix_sort(jnp.asarray(keys), jnp.asarray(vals), steps)
    out_k, out_v = np.asarray(out_k), np.asarray(out_v)
    mask = np.uint32((1 << (4 * steps)) - 1) if steps < 8 else np.uint32(0xFFFFFFFF)
    order = np.argsort(keys & mask, kind="stable")
    ok = np.array_equal(out_k, keys[order]) and np.array_equal(out_v, order.astype(np.uint32))
    print(f"steps={steps}: {'OK' if ok else 'MISMATCH'}")
    if not ok:
        bad = np.nonzero(out_k != keys[order])[0]
        print(f"  first bad idx={bad[:10]}, count={bad.size}")
        print(f"  got  {out_k[bad[:6]]}")
        print(f"  want {keys[order][bad[:6]]}")
        badv = np.nonzero(out_v != order.astype(np.uint32))[0]
        print(f"  val bad idx={badv[:10]}, count={badv.size}")
        # run structure of the failing pass: counts of pass `steps-1`
        break
