#!/usr/bin/env python
"""Chipless AOT compile-check of the Pallas kernels on a v5e topology.

Mosaic lowering constraints (tile shapes, supported ops) are invisible to
interpret mode and normally only surface on a real chip; this tool compiles
the kernels against libtpu's compile-only PJRT topology — no TPU needed, so
kernel lowering bugs are caught at development time (it found the >2D-gather
rejection of jnp.stack in the temporal-attention kernel).

Pallas calls must not be GSPMD-partitioned, so each check wraps the op in a
replicated shard_map over the topology's devices.

  python tools/aot_check.py                # all kernels, all model shapes
  python tools/aot_check.py --what temporal
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-4")
os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("TPU_WORKER_ID", "0")

import argparse
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _mesh():
    topo = topologies.get_topology_desc("v5e:2x2x1", "tpu")
    return Mesh(topo.devices, ("x",))


def check(name, fn, args, mesh):
    spec = tuple(P() for _ in args)
    wrapped = shard_map(fn, mesh=mesh, in_specs=spec, out_specs=P(),
                        check_rep=False)
    try:
        jax.jit(wrapped).lower(*args).compile()
        print(f"OK   {name}")
        return True
    except Exception as e:
        msg = repr(e).splitlines()[0][:200]
        print(f"FAIL {name}: {msg}")
        traceback.print_exc(limit=3)
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="flash")
    args = ap.parse_args()
    what = set(args.what.split(","))
    mesh = _mesh()
    ok = True



    if "flash" in what:
        from stableanimator_tpu.ops.flash_attention import flash_attention

        for b, s, h, d in [(32, 4096, 5, 64), (32, 1024, 10, 64),
                           (32, 9216, 5, 64), (4, 4096, 1, 512)]:
            q = jax.ShapeDtypeStruct((b, s, h, d), jnp.bfloat16)
            ok &= check(f"flash b={b} s={s} h={h} d={d}",
                        lambda q, k, v: flash_attention(q, k, v),
                        (q, q, q), mesh)
        # training path: the custom-VJP backward kernels
        b, s, h, d = 8, 4096, 5, 64
        q = jax.ShapeDtypeStruct((b, s, h, d), jnp.bfloat16)

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v).astype(jnp.float32))

        ok &= check(f"flash_bwd b={b} s={s} h={h} d={d}",
                    lambda q, k, v: jax.grad(loss, argnums=(0, 1, 2))(q, k, v),
                    (q, q, q), mesh)


    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
