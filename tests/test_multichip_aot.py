"""AOT multi-chip lowering: prove the ragged/chunked distributed-sort
programs compile for REAL multi-chip TPU meshes from a single chip (or no
chip at all — PJRT topology compilation is deviceless).

The ragged exchange path cannot EXECUTE anywhere in this environment
(XLA:CPU lacks ragged_all_to_all; only one TPU chip is attached), so the
admissible evidence that the north-star configuration is a real program is
(a) the CPU-tested descriptor algebra (tests/test_ragged_plan.py) and
(b) this test: `jax.experimental.topologies.get_topology_desc` builds an
8-chip v5e topology descriptor and `lower().compile()` runs the full XLA +
Mosaic pipeline against it — a failure here is exactly the failure a pod
user would hit at dispatch time.

Runs in a subprocess (the conftest forces a CPU platform for the rest of
the suite; topology creation needs libtpu). Skips where libtpu/topology
support is absent.
"""

import json
import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from jax.experimental import topologies
import jax, jax.numpy as jnp

try:
    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
except Exception as e:  # no libtpu / no topology support in this env
    print(json.dumps({"skip": str(e)[:200]}))
    sys.exit(0)

mesh = topologies.make_mesh(topo, (8,), ("shards",))
from glu_tpu.parallel.dist_sort import _dist_fn_u32, _dist_fn_u64

sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("shards"))
n = 8 * 4096
ks = jax.ShapeDtypeStruct((n,), jnp.uint32, sharding=sh)

compiled = {}
cases = {
    # the north-star configuration: ragged exchange, engine local sort
    "ragged-pallas-seq": ("pallas", 1),
    # ragged + overlapped chunks (the scaling model's required combination)
    "ragged-pallas-chunked2": ("pallas", 2),
    # routed/platform local sort variant
    "ragged-xla-seq": ("xla", 1),
}
for label, (backend, chunks) in cases.items():
    t0 = time.time()
    fn = _dist_fn_u32(mesh, "shards", 8, 1024, 4505, 2048, backend, "ragged",
                      chunks, None)
    fn.lower(ks, ks).compile()
    compiled[label] = round(time.time() - t0, 1)

# 64-bit pipeline, ragged
t0 = time.time()
fn64 = _dist_fn_u64(mesh, "shards", 8, 1024, 4505, 2048, "pallas", "ragged",
                    1, None)
fn64.lower(ks, ks, ks).compile()
compiled["ragged-pallas-u64"] = round(time.time() - t0, 1)

# 16 chips = TWO v5e hosts (4x4): the ragged + chunked program lowers for
# a multi-HOST topology (ICI+DCN collectives), not just one host's mesh
t0 = time.time()
topo16 = topologies.get_topology_desc(platform="tpu", topology_name="v5e:4x4")
mesh16 = topologies.make_mesh(topo16, (16,), ("shards",))
sh16 = jax.sharding.NamedSharding(mesh16, jax.sharding.PartitionSpec("shards"))
ks16 = jax.ShapeDtypeStruct((16 * 4096,), jnp.uint32, sharding=sh16)
fn16 = _dist_fn_u32(mesh16, "shards", 16, 1024, 4505, 2048, "pallas",
                    "ragged", 2, None)
fn16.lower(ks16, ks16).compile()
compiled["ragged-pallas-chunked2-16chip-2host"] = round(time.time() - t0, 1)

print(json.dumps({"ok": True, "devices": 8, "compile_s": compiled}))
"""


def test_ragged_programs_aot_compile_for_8chip_mesh():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # undo the suite's CPU forcing; let the subprocess see libtpu
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("GLU_TPU_PALLAS_INTERPRET", None)
    # x64 mode (set by the conftest for the DOUBLE dtype tests) sends Mosaic's
    # convert_element_type lowering into infinite recursion when compiling the
    # u32 kernels for a TPU topology — pods run 32-bit mode, as the dist layer
    # does throughout
    env.pop("JAX_ENABLE_X64", None)
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"repo": repo}],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    if "skip" in rec:
        pytest.skip(f"no TPU topology support: {rec['skip']}")
    assert rec["ok"] and rec["devices"] == 8
    assert set(rec["compile_s"]) == {
        "ragged-pallas-seq", "ragged-pallas-chunked2", "ragged-xla-seq",
        "ragged-pallas-u64", "ragged-pallas-chunked2-16chip-2host",
    }
