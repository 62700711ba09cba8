#!/usr/bin/env python
"""AOT model export — the TPU-native analog of the reference's
TorchScript-oriented `project/image_animate` refactor (SURVEY.md §2.1 #14;
the reference re-expresses UNet AND VAE — project/image_animate/unet_3d.py,
vae_3d.py — and this tool additionally exports the whole generate program).

Serialises jitted programs with jax.export into portable StableHLO
artifacts that reload and execute without the Python model definitions:

  python tools/export_model.py --what unet --output unet_512x16.bin \\
      --height 512 --width 512 --frames 16 [--checkpoint_dir ckpt]
  python tools/export_model.py --what vae_decode --output vae_dec.bin ...
  python tools/export_model.py --what generate --output generate.bin ...

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


def _sds(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not isinstance(x, jax.ShapeDtypeStruct) else x, tree)


def export_unet(model, params, b: int, f: int, h8: int, w8: int):
    """UNet forward (reference project/image_animate/unet_3d.py analog)."""
    cfg = model.config
    dt = model.dtype or jnp.float32
    shapes = (
        _sds(params),
        jax.ShapeDtypeStruct((b, f, h8, w8, cfg.in_channels), dt),
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((b, 1 + cfg.num_id_tokens,
                              cfg.cross_attention_dim), dt),
        jax.ShapeDtypeStruct((b, 3), jnp.float32),
        jax.ShapeDtypeStruct((b * f, h8, w8, cfg.block_out_channels[0]), dt),
    )

    def fn(params, sample, t, context, add_ids, pose):
        return model.apply(params, sample, t, context, add_ids, pose)

    return export.export(jax.jit(fn))(*shapes)


def export_vae_decode(vae, params, f: int, h8: int, w8: int):
    """Temporal-VAE decoder (reference project/image_animate/vae_3d.py
    analog): latents [F, h8, w8, 4] -> frames [F, H, W, 3]."""
    shapes = (
        _sds(params),
        jax.ShapeDtypeStruct((f, h8, w8, vae.config.latent_channels),
                             jnp.float32),
    )

    def fn(params, z):
        return vae.apply(params, z, num_frames=f, method=vae.decode)

    return export.export(jax.jit(fn))(*shapes)


def export_vae_encode(vae, params, h: int, w: int):
    """VAE encoder mode path: image [1, H, W, 3] -> latent mode [1, h8, w8, 4]."""
    shapes = (
        _sds(params),
        jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32),
    )

    def fn(params, x):
        return vae.apply(params, x, method=vae.encode).mode()

    return export.export(jax.jit(fn))(*shapes)


def export_generate(models, params, h: int, w: int, f: int, cfg=None):
    """The ENTIRE generation program (conditioning -> scan denoise ->
    decode) as one artifact — beyond the reference refactor's per-module
    exports."""
    import dataclasses

    from stableanimator_tpu.core.config import PipelineConfig
    from stableanimator_tpu.pipeline.animation import _generate_impl

    cfg = cfg or PipelineConfig()
    cfg = dataclasses.replace(cfg, height=h, width=w, num_frames=f,
                              tile_size=min(cfg.tile_size, f))
    shapes = (
        _sds(params),
        jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((f, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, models.face_encoder.config.id_embeddings_dim),
                             jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )

    def fn(params, ref_image, pose_pixels, face_embedding, key):
        return _generate_impl(models, params, ref_image, pose_pixels,
                              face_embedding, cfg, key)

    return export.export(jax.jit(fn))(*shapes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="unet",
                    choices=["unet", "vae_decode", "vae_encode", "generate"])
    ap.add_argument("--output", required=True)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--batch", type=int, default=2, help="2 = CFG pair")
    ap.add_argument("--checkpoint_dir", type=str, default=None)
    args = ap.parse_args()

    from stableanimator_tpu.pipeline import build_models, fast_init_params

    models = build_models(dtype=jnp.bfloat16)
    b, f = args.batch, args.frames
    h, w = args.height, args.width
    h8, w8 = h // 8, w // 8

    if args.checkpoint_dir:
        from stableanimator_tpu.cli.animate import load_params

        tree = load_params(args.checkpoint_dir, models,
                           allow_random_init=False, init_id_adapter=False,
                           height=h, width=w)
    else:
        tree = fast_init_params(models, height=h, width=w)
    if args.what == "unet":
        # bf16 cast is for the UNet only: the VAE is an fp32 island (the
        # pipeline reloads vae.npz in fp32 — see cli/animate.py), so
        # exported VAE artifacts must keep fp32 params to match pipeline
        # numerics.
        tree = jax.tree_util.tree_map(
            lambda x: np.asarray(x).astype(jnp.bfloat16)
            if np.asarray(x).dtype == np.float32 else np.asarray(x), tree)
    elif args.what != "generate":
        tree = jax.tree_util.tree_map(np.asarray, tree)

    if args.what == "unet":
        exported = export_unet(models.unet, {"params": tree["unet"]},
                               b, f, h8, w8)
    elif args.what == "vae_decode":
        exported = export_vae_decode(models.vae, {"params": tree["vae"]},
                                     f, h8, w8)
    elif args.what == "vae_encode":
        exported = export_vae_encode(models.vae, {"params": tree["vae"]}, h, w)
    else:
        exported = export_generate(models, tree, h, w, f)

    blob = exported.serialize()
    with open(args.output, "wb") as fh:
        fh.write(blob)
    print(f"exported {args.what} ({len(blob) / 1e6:.1f} MB StableHLO) "
          f"-> {args.output}")


if __name__ == "__main__":
    main()
