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
    ap.add_argument("--what", default="temporal,flash,int8,norms")
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

    if "norms" in what:
        from stableanimator_tpu.ops.norms_pallas import (group_norm_pallas,
                                                         layer_norm_pallas)

        # LN row sets per UNet level at 512^2 / 576x1024 (CFG batch 2 x 16
        # frames folded) + the CLIP odd-row fallback
        for rows, c in [(32 * 4096, 320), (32 * 1024, 640), (32 * 256, 1280),
                        (32 * 9216, 320), (2 * 4096 * 16, 320), (257, 1280)]:
            x = jax.ShapeDtypeStruct((rows, c), jnp.bfloat16)
            s = jax.ShapeDtypeStruct((c,), jnp.float32)
            ok &= check(f"layer_norm rows={rows} c={c}",
                        lambda x, s, b: layer_norm_pallas(x, s, b),
                        (x, s, s), mesh)

        # GN slabs per UNet level (spatial resblocks see [N, H*W, C]);
        # temporal resblocks see the same slabs with N = frames; up-block
        # resblocks see concat-skip channel counts 960/1920/2560 (960 is
        # NOT lane-aligned — keep it covered). Shape set = the union traced
        # out of the real 512^2 x 16f generate graph. Slabs above
        # _GN_SLAB_LIMIT (576x1024 level 0 = 5.9 MB, VAE decode) exceed
        # VMEM with Mosaic's double buffering — gn_supported must route
        # them to XLA, asserted below.
        for n, sp, c in [(32, 4096, 320), (32, 1024, 640), (32, 256, 1280),
                         (32, 64, 1280), (32, 1024, 960), (32, 256, 1920),
                         (32, 256, 2560), (32, 64, 2560), (1, 128, 1280),
                         (2, 4096, 320)]:
            x = jax.ShapeDtypeStruct((n, sp, c), jnp.bfloat16)
            s = jax.ShapeDtypeStruct((c,), jnp.float32)
            ok &= check(f"group_norm n={n} s={sp} c={c}",
                        lambda x, s, b: group_norm_pallas(x, s, b, 32),
                        (x, s, s), mesh)

        from stableanimator_tpu.ops.norms_pallas import gn_supported

        # shape/dtype-only predicate: probe with ShapeDtypeStruct so this
        # tool never touches the (possibly wedged) axon backend eagerly
        for n, sp, c in [(32, 9216, 320), (16, 4096, 512)]:
            flag = not gn_supported(
                jax.ShapeDtypeStruct((n, sp, c), jnp.bfloat16), 32)
            print(("OK  " if flag else "FAIL")
                  + f" gn_supported rejects n={n} s={sp} c={c}")
            ok &= flag

        # training path: custom-VJP backward (recomputes the XLA formula)
        x = jax.ShapeDtypeStruct((4, 1024, 320), jnp.bfloat16)
        s = jax.ShapeDtypeStruct((320,), jnp.float32)

        def _gn_loss(x, s, b):
            return jnp.sum(group_norm_pallas(x, s, b, 32).astype(jnp.float32))

        ok &= check("group_norm_bwd",
                    lambda x, s, b: jax.grad(_gn_loss, argnums=(0, 1, 2))(x, s, b),
                    (x, s, s), mesh)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
