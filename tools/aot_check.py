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
    ap.add_argument("--what", default="temporal,flash,int8")
    args = ap.parse_args()
    what = set(args.what.split(","))
    mesh = _mesh()
    ok = True

    if "temporal" in what:
        from stableanimator_tpu.ops.temporal_attention import (
            temporal_attention_spatial)

        # every (S, heads, hd) level of the UNet at 512^2 and 576x1024,
        # plus the tiny-config 1x1-spatial case
        shapes = [
            (2, 16, 4096, 5, 64),    # L0 @512^2
            (2, 16, 1024, 10, 64),   # L1
            (2, 16, 256, 20, 64),    # L2
            (2, 16, 64, 20, 64),     # mid
            (2, 16, 9216, 5, 64),    # L0 @576x1024
            (1, 2, 1, 2, 8),         # tiny-config mid block
        ]
        for b, f, s, h, d in shapes:
            q = jax.ShapeDtypeStruct((b * f, s, h * d), jnp.bfloat16)

            def fn(q, k, v, f=f, h=h):
                return temporal_attention_spatial(q, k, v, f, h)

            ok &= check(f"temporal_attn b={b} f={f} s={s} h={h} d={d}",
                        fn, (q, q, q), mesh)

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

    if "int8" in what:
        from stableanimator_tpu.ops.quant_pallas import int8_matmul_pallas

        # transformer FF/GEGLU/projection shapes: (tokens, K, N) per UNet
        # level at 512^2 (CFG batch 2 x 16 frames folded into tokens)
        shapes = [
            (32 * 4096, 320, 2560),    # L0 GEGLU proj (inner 2x for gate)
            (32 * 4096, 1280, 320),    # L0 FF out
            (32 * 1024, 640, 5120),
            (32 * 256, 1280, 10240),   # L2/L3 GEGLU
            (32 * 256, 5120, 1280),    # L2/L3 FF out
            (32 * 4096, 320, 320),     # attention out-proj
        ]
        for m, k, n in shapes:
            x = jax.ShapeDtypeStruct((m, k), jnp.bfloat16)
            wq = jax.ShapeDtypeStruct((k, n), jnp.int8)
            ws = jax.ShapeDtypeStruct((n,), jnp.float32)
            ok &= check(f"int8_w8a8 m={m} k={k} n={n}",
                        lambda x, wq, ws: int8_matmul_pallas(x, wq, ws),
                        (x, wq, ws), mesh)

        from stableanimator_tpu.ops.quant_pallas import int8_geglu_pallas

        for m, k, n2 in [(32 * 4096, 320, 2560), (32 * 1024, 640, 5120),
                         (32 * 256, 1280, 10240)]:
            x = jax.ShapeDtypeStruct((m, k), jnp.bfloat16)
            wq = jax.ShapeDtypeStruct((k, n2), jnp.int8)
            ws = jax.ShapeDtypeStruct((n2,), jnp.float32)
            b = jax.ShapeDtypeStruct((n2,), jnp.float32)
            ok &= check(f"int8_geglu m={m} k={k} n2={n2}",
                        lambda x, wq, ws, b: int8_geglu_pallas(x, wq, ws, b),
                        (x, wq, ws, b), mesh)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
