"""lax.sort non-power-of-2 cliff lab (round 5).

The router's lax-side cost table was measured at exact powers of two —
where XLA's TPU sort turns out to have a fast path. Measured here at
~1.4e8, 2-operand stable sort (chained timing):

    2^27 exact            4.387 ns/key
    2^27+2^20 (+0.8%)     5.759   (+31%)
    ceil(1.05*2^27)       5.848
    1.05x rnd to 2^20     5.683
    1.10x rnd to 2^20     5.615
    3*2^26 (2.01e8)       5.218   (vs ~4.7 pow2-interp: +11%)
    engine @ ceil(1.05x)  4.852   (flat in n -> WINS every non-pow2 row)

Consequence: the router model gains lax_nonpow2_factor (~1.28); non-pow2
full-width kv sorts route to the engine from ~2^26 up. This is also the
receiver-budget sort of the distributed pipeline (1.05x local_n is never
a power of two) — the scaling model v2 prices the routed min directly.

Usage: python proto/lax_cliff_lab.py
"""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from bench import _chain_time, _rand_u32
from glu_tpu import radix_sort

base = 1 << 27
sizes = {
    "2^27 exact": base,
    "2^27+2^20": base + (1 << 20),
    "ceil(1.05x)": int(np.ceil(1.05 * base)),
    "1.05x rnd 2^20": ((int(1.05 * base) + (1 << 20) - 1) >> 20) << 20,
    "1.10x rnd 2^20": ((int(1.10 * base) + (1 << 20) - 1) >> 20) << 20,
    "1.5*2^26 (pow2-frac)": 3 << 26,
}
for name, n in sizes.items():
    k = _rand_u32(n, 1); v = jnp.arange(n, dtype=jnp.uint32)
    t = _chain_time(lambda s: jax.lax.sort((s[0], s[1]), num_keys=1, is_stable=True), (k, v), 3)
    print(f"lax 2-op {name:22s} n={n}: {t/n*1e9:6.3f} ns/key", flush=True)
    del k, v
# engine at the ugly 1.05 size
n = int(np.ceil(1.05 * base))
k = _rand_u32(n, 1); v = jnp.arange(n, dtype=jnp.uint32)
t = _chain_time(lambda s: radix_sort(s[0], s[1], backend="pallas"), (k, v), 2)
print(f"engine   ceil(1.05x)          n={n}: {t/n*1e9:6.3f} ns/key", flush=True)
