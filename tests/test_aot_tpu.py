"""Chipless Mosaic lowering regression tests (slow tier).

Compiles the Pallas kernels at representative model shapes against
libtpu's compile-only v5e PJRT topology — catches Mosaic constraint
violations (unsupported ops, VMEM overflow) that interpret-mode unit
tests cannot see. No TPU hardware needed; skipped when libtpu is absent.
"""

import os

import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def _topology_mesh():
    os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")
    from jax.experimental import topologies
    from jax.sharding import Mesh

    try:
        topo = topologies.get_topology_desc(
            "v5e:1x1x1", "tpu", chips_per_host_bounds=(1, 1, 1))
    except Exception as e:  # pragma: no cover - no libtpu in env
        pytest.skip(f"compile-only TPU topology unavailable: {e!r}")
    return Mesh(topo.devices, ("x",))


def _compile(fn, args, mesh):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    wrapped = shard_map(fn, mesh=mesh, in_specs=tuple(P() for _ in args),
                        out_specs=P(), check_rep=False)
    jax.jit(wrapped).lower(*args).compile()



@pytest.mark.parametrize("b,s,h,d", [(32, 4096, 5, 64), (4, 4096, 1, 512)])
def test_flash_attention_lowers_on_v5e(b, s, h, d):
    from stableanimator_tpu.ops.flash_attention import flash_attention

    mesh = _topology_mesh()
    q = jax.ShapeDtypeStruct((b, s, h, d), jnp.bfloat16)
    _compile(lambda q, k, v: flash_attention(q, k, v), (q, q, q), mesh)




def test_v5e8_topology_aot_micro_generate():
    """The sharded generate program AOT-compiles against the REAL v5e:2x4
    topology (tools/aot_v5e8.py `micro` target, in-subprocess for libtpu's
    one-process lockfile) and reports a memory analysis + collective
    schedule. This is the flow that surfaced the mesh-path flash-kernel
    bug ("Mosaic kernels cannot be automatically partitioned") that the
    CPU-mesh lowering tests can never see — CPU routes attention to XLA."""
    import json
    import subprocess
    import sys as _sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [_sys.executable, os.path.join(root, "tools", "aot_v5e8.py"),
         "--target", "micro"],
        capture_output=True, text=True, timeout=900, cwd=root)
    if proc.returncode != 0 and "topology" in proc.stderr.lower():
        pytest.skip("compile-only TPU topology unavailable")
    assert proc.returncode == 0, proc.stderr[-1500:]
    rec = json.loads([ln for ln in proc.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert rec["status"] == "ok"
    assert rec["memory"]["fits_16gib_chip"]
    assert rec["memory"]["peak_hbm_bytes_est"] > 0
    assert "all-gather" in rec["collectives"] or rec["collectives"]
