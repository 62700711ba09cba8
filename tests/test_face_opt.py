"""HJB face-optimization tests (pipeline/face_opt.py).

A tiny differentiable stand-in recogniser replaces ArcFace; the tests check
that (a) the inner solver strictly reduces the identity cost, (b) it only
acts inside its step window, and (c) the full generate() path runs with the
optimizer attached and changes the output versus the unoptimized path.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stableanimator_tpu.core.config import PipelineConfig
from stableanimator_tpu.pipeline.face_opt import (
    FaceOptConfig,
    FaceOptimizer,
    face_boxes_from_pose,
)


def _stand_in_arcface(pixels):
    """[N, 3, S, S] -> [N, 8] cheap differentiable embedding."""
    n = pixels.shape[0]
    pooled = jnp.mean(pixels.reshape(n, 3, 4, 28, 4, 28), axis=(3, 5))
    return pooled.reshape(n, -1)[:, :8]


def _decode_fn(latents, num_frames):
    """[F, c, c, 4] latent crops -> [F, 8c, 8c, 3] 'pixels' via a fixed
    differentiable upsample-projection."""
    f, h, w, _ = latents.shape
    x = jnp.tanh(latents[..., :3])
    x = jnp.repeat(jnp.repeat(x, 8, axis=1), 8, axis=2)
    return x


def _make_opt(steps=2, lr=0.5, start=0, end=100):
    cfg = FaceOptConfig(steps=steps, lr=lr, start_step=start, end_step=end,
                        latent_crop=4, arcface_size=112)
    target = np.ones((8,), np.float32)
    boxes = np.zeros((3, 2), np.int32)
    return FaceOptimizer(cfg, _stand_in_arcface, _decode_fn, target, boxes)


def test_refine_reduces_identity_cost():
    opt = _make_opt(steps=3, lr=1.0)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 8, 8, 4)),
                     jnp.float32)
    before = float(opt.identity_cost(x0))
    refined = opt.refine(x0, jnp.int32(0))
    after = float(opt.identity_cost(refined))
    assert after < before, (before, after)


def test_refine_respects_step_window():
    opt = _make_opt(steps=2, start=5, end=10)
    x0 = jnp.asarray(np.random.default_rng(1).normal(size=(1, 3, 8, 8, 4)),
                     jnp.float32)
    out_before_window = opt.refine(x0, jnp.int32(2))
    out_in_window = opt.refine(x0, jnp.int32(7))
    np.testing.assert_array_equal(np.asarray(out_before_window), np.asarray(x0))
    assert np.abs(np.asarray(out_in_window) - np.asarray(x0)).max() > 0


def test_face_boxes_from_pose():
    faces = np.full((2, 68, 2), 0.5)
    boxes = face_boxes_from_pose(faces, latent_h=64, latent_w=64, crop=16)
    np.testing.assert_array_equal(boxes, [[24, 24], [24, 24]])
    # invisible landmarks fall back to center
    faces_invisible = np.zeros((1, 68, 2))
    boxes = face_boxes_from_pose(faces_invisible, 64, 64, crop=16)
    np.testing.assert_array_equal(boxes, [[24, 24]])


def test_generate_with_face_opt_runs_and_differs(tiny_setup=None):
    from tests.test_pipeline import tiny_setup as fixture  # reuse builder
    import dataclasses as dc

    from stableanimator_tpu.core.config import (
        CLIPVisionConfig, FaceEncoderConfig, PoseNetConfig, UNetConfig, VAEConfig)
    from stableanimator_tpu.pipeline import build_models, generate, init_params

    models = build_models(
        unet_cfg=UNetConfig.tiny(), vae_cfg=VAEConfig.tiny(),
        clip_cfg=CLIPVisionConfig.tiny(),
        pose_cfg=dc.replace(PoseNetConfig.tiny(), noise_latent_channels=32),
        face_cfg=dc.replace(FaceEncoderConfig.tiny(), cross_attention_dim=48,
                            clip_embeddings_dim=48),
        dtype=None, use_flash=False)
    params = init_params(models, jax.random.PRNGKey(0), height=64, width=64)

    rng = np.random.default_rng(5)
    ref = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    pose = jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 3)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)
    cfg = PipelineConfig(num_frames=2, tile_size=2, tile_overlap=1,
                         num_inference_steps=2, decode_chunk_size=2)

    base = generate(models, params, ref, pose, emb, cfg,
                    rng=jax.random.PRNGKey(3))

    def decode_fn(latents, num_frames):
        z = latents / models.vae.config.scaling_factor
        return models.vae.apply({"params": params["vae"]}, z,
                                num_frames=num_frames,
                                method=models.vae.decode).astype(jnp.float32)

    opt = FaceOptimizer(
        FaceOptConfig(steps=1, lr=0.5, start_step=0, latent_crop=4),
        _stand_in_arcface, decode_fn,
        np.ones((8,), np.float32), np.zeros((2, 2), np.int32))
    refined = generate(models, params, ref, pose, emb, cfg,
                       rng=jax.random.PRNGKey(3), face_opt=opt)
    assert refined.shape == base.shape
    assert np.isfinite(np.asarray(refined)).all()
    assert np.abs(np.asarray(refined) - np.asarray(base)).max() > 1e-6
