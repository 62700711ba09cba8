#!/usr/bin/env python
"""AOT model export — the TPU-native analog of the reference's
TorchScript-oriented `project/image_animate` refactor (SURVEY.md §2.1 #14).

Serialises the jitted UNet forward (and optionally the whole generate
program) with jax.export into a portable StableHLO artifact that can be
reloaded and executed without the Python model definitions:

  python tools/export_model.py --output unet_512x16.bin \\
      --height 512 --width 512 --frames 16 [--checkpoint_dir ckpt]

  # reload:
  from jax import export
  exported = export.deserialize(open("unet_512x16.bin", "rb").read())
  out = exported.call(params, sample, t, context, add_ids, pose)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

import jax
import jax.numpy as jnp
from jax import export


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--batch", type=int, default=2, help="2 = CFG pair")
    ap.add_argument("--checkpoint_dir", type=str, default=None)
    args = ap.parse_args()

    from stableanimator_tpu.core.config import UNetConfig
    from stableanimator_tpu.models.unet import UNetSpatioTemporal

    cfg = UNetConfig()
    model = UNetSpatioTemporal(cfg, dtype=jnp.bfloat16)
    b, f = args.batch, args.frames
    h8, w8 = args.height // 8, args.width // 8

    shapes = dict(
        sample=jax.ShapeDtypeStruct((b, f, h8, w8, cfg.in_channels), jnp.bfloat16),
        t=jax.ShapeDtypeStruct((), jnp.float32),
        context=jax.ShapeDtypeStruct((b, 1 + cfg.num_id_tokens,
                                      cfg.cross_attention_dim), jnp.bfloat16),
        add_ids=jax.ShapeDtypeStruct((b, 3), jnp.float32),
        pose=jax.ShapeDtypeStruct((b * f, h8, w8, cfg.block_out_channels[0]),
                                  jnp.bfloat16),
    )
    if args.checkpoint_dir:
        from stableanimator_tpu.cli.animate import load_params
        from stableanimator_tpu.pipeline import build_models

        params_tree = load_params(args.checkpoint_dir, build_models(),
                                  allow_random_init=False,
                                  init_id_adapter=False,
                                  height=args.height, width=args.width)["unet"]
        params_shape = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.bfloat16),
            {"params": params_tree})
    else:
        params_shape = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros(shapes["sample"].shape, jnp.bfloat16),
                                 jnp.float32(0), jnp.zeros(shapes["context"].shape, jnp.bfloat16),
                                 jnp.zeros(shapes["add_ids"].shape, jnp.float32),
                                 jnp.zeros(shapes["pose"].shape, jnp.bfloat16)),
            jax.random.PRNGKey(0))
        params_shape = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, jnp.bfloat16), params_shape)

    def fn(params, sample, t, context, add_ids, pose):
        return model.apply(params, sample, t, context, add_ids, pose)

    exported = export.export(jax.jit(fn))(
        params_shape, shapes["sample"], shapes["t"], shapes["context"],
        shapes["add_ids"], shapes["pose"])
    blob = exported.serialize()
    with open(args.output, "wb") as fh:
        fh.write(blob)
    print(f"exported UNet forward ({len(blob) / 1e6:.1f} MB StableHLO) "
          f"-> {args.output}")


if __name__ == "__main__":
    main()
