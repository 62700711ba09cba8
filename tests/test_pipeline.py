"""End-to-end pipeline tests on tiny configs.

The key correctness test re-implements the reference's denoising loop shape
(two sequential UNet calls per tile, Python loops — reference
inference_pipeline_animation.py:641-699) directly against the same Flax
models, and checks our batched/scanned denoise matches it numerically.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stableanimator_tpu.core.config import (
    CLIPVisionConfig,
    FaceEncoderConfig,
    PipelineConfig,
    PoseNetConfig,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
)
from stableanimator_tpu.diffusion.scheduler import (
    make_schedule,
    scale_model_input,
    step_euler,
)
from stableanimator_tpu.diffusion.tiling import tile_blend_weight, tile_indices
from stableanimator_tpu.pipeline import (
    build_models,
    denoise,
    generate,
    fast_init_params,
)

# compile-heavy (full pipeline graphs on XLA:CPU); excluded from the smoke tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_setup():
    from tests.conftest import build_micro_models

    models = build_micro_models()  # fp32 on CPU for exact comparisons
    params = fast_init_params(models, height=64, width=64)
    return models, params


def _reference_style_denoise(models, params, latents, context, image_latents,
                             add_time_ids, pose_latents, schedule, cfg):
    """Direct transcription of the reference loop semantics: Python loop over
    timesteps and tiles, two UNet calls per tile, weight/count blending."""
    f = latents.shape[1]
    indices = tile_indices(f, cfg.tile_size, cfg.tile_overlap)
    weights = tile_blend_weight(cfg.tile_size)
    guidance = np.linspace(cfg.min_guidance_scale, cfg.max_guidance_scale, f,
                           dtype=np.float32)[None, :, None, None, None]

    lat = np.asarray(latents, np.float32)
    img_cond = np.asarray(image_latents[1])
    for i in range(schedule.timesteps.shape[0]):
        sigma = float(schedule.sigmas[i])
        sigma_next = float(schedule.sigmas[i + 1])
        t = float(schedule.timesteps[i])
        lat_in = np.asarray(scale_model_input(jnp.asarray(lat), sigma))
        noise_pred = np.zeros((2,) + lat.shape[1:], np.float32)
        counts = np.zeros((f,), np.float32)
        for idx in indices:
            x = lat_in[0][idx][None]  # [1, T, h, w, 4]
            img_u = np.zeros_like(np.broadcast_to(img_cond, x.shape[:-1] + (4,)))
            img_c = np.broadcast_to(img_cond, x.shape[:-1] + (4,))
            pose = np.asarray(pose_latents)[idx]

            out_u = models.unet.apply(
                {"params": params["unet"]},
                jnp.asarray(np.concatenate([x, img_u], -1)), jnp.float32(t),
                jnp.zeros_like(context[:1]), add_time_ids[:1], None)
            out_c = models.unet.apply(
                {"params": params["unet"]},
                jnp.asarray(np.concatenate([x, img_c], -1)), jnp.float32(t),
                context[1:], add_time_ids[1:], jnp.asarray(pose))
            w = weights[:, None, None, None]
            noise_pred[0][idx] += np.asarray(out_u)[0] * w
            noise_pred[1][idx] += np.asarray(out_c)[0] * w
            counts[idx] += weights
        noise_pred /= counts[None, :, None, None, None]
        combined = noise_pred[0] + guidance[0] * (noise_pred[1] - noise_pred[0])
        lat = np.asarray(step_euler(jnp.asarray(combined[None]),
                                    jnp.asarray(lat), sigma, sigma_next))
    return lat


@pytest.mark.parametrize("num_frames,tile,overlap", [(4, 4, 1), (6, 4, 1)])
def test_denoise_matches_reference_loop(tiny_setup, num_frames, tile, overlap):
    models, params = tiny_setup
    rng = np.random.default_rng(0)
    h8 = 8
    cfg = PipelineConfig(height=64, width=64, num_frames=num_frames,
                         tile_size=tile, tile_overlap=overlap,
                         num_inference_steps=3, decode_chunk_size=2)
    schedule = make_schedule(cfg.num_inference_steps, SchedulerConfig())

    latents = jnp.asarray(rng.normal(size=(1, num_frames, h8, h8, 4)), jnp.float32) * 10.0
    context = jnp.asarray(rng.normal(size=(2, 5, 48)), jnp.float32)
    context = context.at[0].set(0.0)
    image_latents = jnp.asarray(rng.normal(size=(2, h8, h8, 4)), jnp.float32)
    image_latents = image_latents.at[0].set(0.0)
    add_time_ids = jnp.asarray([[6.0, 127.0, 0.02]] * 2, jnp.float32)
    pose_latents = jnp.asarray(rng.normal(size=(num_frames, h8, h8, 32)), jnp.float32)

    ours = denoise(models, params, latents, context, image_latents,
                   add_time_ids, pose_latents, schedule, cfg)
    ref = _reference_style_denoise(models, params, latents, context,
                                   image_latents, add_time_ids, pose_latents,
                                   schedule, cfg)
    # The two paths run identical math on different batch shapes (one
    # batched call vs per-tile calls), so fp32 reduction orders differ; the
    # EDM step amplifies per-call output noise by ~sigma (700 at step 0),
    # i.e. ~1e-4 of UNet noise becomes ~0.03 in latent space. Incoherent
    # noise stays small in L2; a semantic divergence in tiling / guidance /
    # stepping is coherent and blows both bounds by orders of magnitude.
    ours = np.asarray(ours)
    rel_l2 = np.linalg.norm(ours - ref) / np.linalg.norm(ref)
    assert rel_l2 < 4e-3, f"rel L2 {rel_l2:.2e}"
    assert np.abs(ours - ref).max() < 0.06, np.abs(ours - ref).max()


@pytest.mark.parametrize("group", [1, 3])
def test_denoise_grouped_matches_batched(tiny_setup, group):
    """max_tile_batch (long-video bounded-HBM path) runs the same math as
    the all-tiles-batched path: scan over tile groups, masked zero-weight
    padding, scatter-add blend. Only fp32 reduction order differs (different
    UNet batch shapes + group-by-group accumulation), amplified ~sigma by
    the EDM step — same bound rationale as
    test_denoise_matches_reference_loop. group=3 with 4 tiles exercises the
    padded duplicate tile."""
    models, params = tiny_setup
    rng = np.random.default_rng(5)
    h8 = 8
    num_frames, tile, overlap = 10, 4, 2   # 4 tiles, no tail window
    cfg = PipelineConfig(height=64, width=64, num_frames=num_frames,
                         tile_size=tile, tile_overlap=overlap,
                         num_inference_steps=3, decode_chunk_size=2)
    schedule = make_schedule(cfg.num_inference_steps, SchedulerConfig())

    latents = jnp.asarray(rng.normal(size=(1, num_frames, h8, h8, 4)), jnp.float32) * 10.0
    context = jnp.asarray(rng.normal(size=(2, 5, 48)), jnp.float32).at[0].set(0.0)
    image_latents = jnp.asarray(rng.normal(size=(2, h8, h8, 4)), jnp.float32).at[0].set(0.0)
    add_time_ids = jnp.asarray([[6.0, 127.0, 0.02]] * 2, jnp.float32)
    pose_latents = jnp.asarray(rng.normal(size=(num_frames, h8, h8, 32)), jnp.float32)

    batched = denoise(models, params, latents, context, image_latents,
                      add_time_ids, pose_latents, schedule, cfg)
    grouped = denoise(models, params, latents, context, image_latents,
                      add_time_ids, pose_latents, schedule,
                      dataclasses.replace(cfg, max_tile_batch=group))
    a, b = np.asarray(grouped), np.asarray(batched)
    rel_l2 = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel_l2 < 4e-3, f"rel L2 {rel_l2:.2e}"
    assert np.abs(a - b).max() < 0.06, np.abs(a - b).max()


def test_generate_grouped_end_to_end(tiny_setup):
    """Full jitted generate with max_tile_batch set (the long-video config
    the CLI auto-selects past 4 tiles)."""
    models, params = tiny_setup
    rng = np.random.default_rng(6)
    ref_image = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    pose = jnp.asarray(rng.uniform(-1, 1, size=(10, 64, 64, 3)), jnp.float32)
    face = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)
    cfg = PipelineConfig(num_frames=10, tile_size=4, tile_overlap=2,
                         num_inference_steps=2, decode_chunk_size=3,
                         max_tile_batch=2)
    frames = generate(models, params, ref_image, pose, face, cfg,
                      rng=jax.random.PRNGKey(11))
    assert frames.shape == (10, 64, 64, 3)
    assert np.isfinite(np.asarray(frames)).all()


def test_auto_tile_batch_policy():
    from stableanimator_tpu.diffusion.tiling import auto_tile_batch

    assert auto_tile_batch(16, 16, 4) is None          # single tile
    assert auto_tile_batch(52, 16, 4) is None          # 4 tiles: batch all
    # odd tile counts take groups of 1 (pad-free: 5 slots/step, measured
    # 20% faster at 64f than groups of 2 with a padded 6th slot)
    assert auto_tile_batch(64, 16, 4) == 1             # 5 tiles
    assert auto_tile_batch(450, 16, 4) == 2            # 38 tiles: even, no pad


def test_auto_default_routes_long_videos_grouped(tiny_setup):
    """PipelineConfig's default max_tile_batch="auto" sends a >4-tile video
    through the grouped path with the same math as the all-batched path."""
    models, params = tiny_setup
    rng = np.random.default_rng(7)
    h8 = 8
    num_frames, tile, overlap = 14, 4, 1   # 5 tiles -> auto picks groups of 2
    cfg = PipelineConfig(height=64, width=64, num_frames=num_frames,
                         tile_size=tile, tile_overlap=overlap,
                         num_inference_steps=2, decode_chunk_size=2)
    assert cfg.max_tile_batch == "auto"

    latents = jnp.asarray(rng.normal(size=(1, num_frames, h8, h8, 4)), jnp.float32) * 10.0
    context = jnp.asarray(rng.normal(size=(2, 5, 48)), jnp.float32).at[0].set(0.0)
    image_latents = jnp.asarray(rng.normal(size=(2, h8, h8, 4)), jnp.float32).at[0].set(0.0)
    add_time_ids = jnp.asarray([[6.0, 127.0, 0.02]] * 2, jnp.float32)
    pose_latents = jnp.asarray(rng.normal(size=(num_frames, h8, h8, 32)), jnp.float32)
    schedule = make_schedule(cfg.num_inference_steps, SchedulerConfig())

    auto = denoise(models, params, latents, context, image_latents,
                   add_time_ids, pose_latents, schedule, cfg)
    batched = denoise(models, params, latents, context, image_latents,
                      add_time_ids, pose_latents, schedule,
                      dataclasses.replace(cfg, max_tile_batch=None))
    a, b = np.asarray(auto), np.asarray(batched)
    rel_l2 = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel_l2 < 4e-3, f"rel L2 {rel_l2:.2e}"


def test_generate_end_to_end(tiny_setup):
    models, params = tiny_setup
    rng = np.random.default_rng(1)
    ref_image = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    pose = jnp.asarray(rng.uniform(-1, 1, size=(4, 64, 64, 3)), jnp.float32)
    face = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)
    cfg = PipelineConfig(num_frames=4, tile_size=4, tile_overlap=1,
                         num_inference_steps=2, decode_chunk_size=2)
    frames = generate(models, params, ref_image, pose, face, cfg,
                      rng=jax.random.PRNGKey(7))
    assert frames.shape == (4, 64, 64, 3)
    assert np.isfinite(np.asarray(frames)).all()
    assert float(frames.min()) >= 0.0 and float(frames.max()) <= 1.0


def test_generate_uint8_inputs_match_fp32(tiny_setup):
    """uint8 ref/pose/clip inputs (converted on device) track the fp32
    convention to input-ulp level: XLA compiles the /255 and /127.5 as
    multiply-by-reciprocal (1 ulp off numpy's true division), so outputs
    agree to noise, not bits."""
    models, params = tiny_setup
    rng = np.random.default_rng(3)
    ref_u8 = rng.integers(0, 256, size=(1, 64, 64, 3), dtype=np.uint8)
    pose_u8 = rng.integers(0, 256, size=(4, 64, 64, 3), dtype=np.uint8)
    face = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)
    cfg = PipelineConfig(num_frames=4, tile_size=4, tile_overlap=1,
                         num_inference_steps=2, decode_chunk_size=2)
    f32 = generate(models, params,
                   jnp.asarray(ref_u8.astype(np.float32) / 255.0),
                   jnp.asarray(pose_u8.astype(np.float32) / 127.5 - 1.0),
                   face, cfg, rng=jax.random.PRNGKey(9))
    u8 = generate(models, params, jnp.asarray(ref_u8), jnp.asarray(pose_u8),
                  face, cfg, rng=jax.random.PRNGKey(9))
    a, b = np.asarray(u8), np.asarray(f32)
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=0)
    assert np.abs(a - b).mean() < 1e-4


def test_generate_longer_than_tile(tiny_setup):
    models, params = tiny_setup
    rng = np.random.default_rng(2)
    ref_image = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    pose = jnp.asarray(rng.uniform(-1, 1, size=(6, 64, 64, 3)), jnp.float32)
    face = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)
    cfg = PipelineConfig(num_frames=6, tile_size=4, tile_overlap=2,
                         num_inference_steps=2, decode_chunk_size=3)
    frames = generate(models, params, ref_image, pose, face, cfg,
                      rng=jax.random.PRNGKey(8))
    assert frames.shape == (6, 64, 64, 3)
    assert np.isfinite(np.asarray(frames)).all()


def test_generate_segmented_matches_single_program(tiny_setup):
    """steps_per_dispatch splits the Euler loop into host-dispatched segment
    programs (one compiled program, traced step offset); the result must
    match the single-scan program. 3 steps at spd=2 exercises the remainder
    segment and the offset carry."""
    models, params = tiny_setup
    rng = np.random.default_rng(9)
    ref_image = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    pose = jnp.asarray(rng.uniform(-1, 1, size=(4, 64, 64, 3)), jnp.float32)
    face = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)
    cfg = PipelineConfig(num_frames=4, tile_size=4, tile_overlap=1,
                         num_inference_steps=3, decode_chunk_size=2,
                         steps_per_dispatch=None)
    single = generate(models, params, ref_image, pose, face, cfg,
                      rng=jax.random.PRNGKey(13))
    seg = generate(models, params, ref_image, pose, face,
                   dataclasses.replace(cfg, steps_per_dispatch=2),
                   rng=jax.random.PRNGKey(13))
    a, b = np.asarray(seg), np.asarray(single)
    rel_l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
    assert rel_l2 < 4e-3, f"rel L2 {rel_l2:.2e}"
    assert np.abs(a - b).max() < 0.06, np.abs(a - b).max()


def test_generate_segmented_long_video_progress(tiny_setup):
    """Long-video (grouped tiles) generation through the segmented path:
    progress callback reports each segment, decode runs in host-dispatched
    groups (batched_decode_max_latent_volume forces 4+4+4+2 frames with a
    remainder program), and the result matches the single-program path."""
    models, params = tiny_setup
    rng = np.random.default_rng(10)
    ref_image = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    pose = jnp.asarray(rng.uniform(-1, 1, size=(14, 64, 64, 3)), jnp.float32)
    face = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)
    # 14 frames at tile 4 / overlap 1 = 5 tiles -> grouped denoise; spd=2
    # over 3 steps = 2 segments; decode volume 2*(2*64) -> groups of 4
    cfg = PipelineConfig(num_frames=14, tile_size=4, tile_overlap=1,
                         num_inference_steps=3, decode_chunk_size=2,
                         steps_per_dispatch=2,
                         batched_decode_max_latent_volume=2 * 2 * 64)
    seen = []
    frames = generate(models, params, ref_image, pose, face, cfg,
                      rng=jax.random.PRNGKey(14),
                      progress=lambda done, total: seen.append((done, total)))
    assert frames.shape == (14, 64, 64, 3)
    assert np.isfinite(np.asarray(frames)).all()
    assert seen == [(2, 3), (3, 3)]

    single = generate(models, params, ref_image, pose, face,
                      dataclasses.replace(cfg, steps_per_dispatch=None),
                      rng=jax.random.PRNGKey(14))
    a, b = np.asarray(frames), np.asarray(single)
    rel_l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
    assert rel_l2 < 4e-3, f"rel L2 {rel_l2:.2e}"


def test_warm_generate_covers_both_paths(tiny_setup):
    """warm_generate pre-compiles exactly the programs generate() dispatches
    (flat AOT; segmented dummy-executed), and a subsequent real generate()
    returns the same frames as a cold one — the warm must be semantically
    invisible."""
    from stableanimator_tpu.pipeline import warm_generate

    models, params = tiny_setup
    rng = np.random.default_rng(21)
    ref_image = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    face = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)

    # segmented long-video config (5 tiles -> grouped, spd=2, decode groups)
    pose = jnp.asarray(rng.uniform(-1, 1, size=(14, 64, 64, 3)), jnp.float32)
    cfg = PipelineConfig(num_frames=14, height=64, width=64, tile_size=4,
                         tile_overlap=1, num_inference_steps=3,
                         decode_chunk_size=2, steps_per_dispatch=2,
                         batched_decode_max_latent_volume=2 * 2 * 64)
    info = warm_generate(models, params, cfg, uint8_inputs=False)
    assert info["path"] == "segmented" and info["executed"]
    # prep + segments {2,1} + decode groups {4,2} = 5 programs
    assert info["programs"] == 5
    warm = generate(models, params, ref_image, pose, face, cfg,
                    rng=jax.random.PRNGKey(14))
    cold = generate(models, params, ref_image, pose, face, cfg,
                    rng=jax.random.PRNGKey(14))
    np.testing.assert_array_equal(np.asarray(warm), np.asarray(cold))

    # flat short-video config: AOT compile only
    pose4 = jnp.asarray(rng.uniform(-1, 1, size=(4, 64, 64, 3)), jnp.float32)
    cfg4 = PipelineConfig(num_frames=4, height=64, width=64, tile_size=4,
                          tile_overlap=1, num_inference_steps=2,
                          decode_chunk_size=2)
    info4 = warm_generate(models, params, cfg4, uint8_inputs=False)
    assert info4 == {"path": "flat", "programs": 1, "executed": False,
                     "face_opt": False}
    out = generate(models, params, ref_image, pose4, face, cfg4,
                   rng=jax.random.PRNGKey(3))
    assert out.shape == (4, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_output_uint8_matches_host_conversion(tiny_setup):
    """cfg.output_uint8 converts to pixels inside the decode program with
    frames_to_uint8 semantics (round half up); device fp32 vs numpy's
    float64 promotion can differ by at most one code at rounding
    boundaries."""
    from stableanimator_tpu.utils.image import frames_to_uint8

    models, params = tiny_setup
    rng = np.random.default_rng(11)
    ref_image = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    pose = jnp.asarray(rng.uniform(-1, 1, size=(4, 64, 64, 3)), jnp.float32)
    face = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)
    cfg = PipelineConfig(num_frames=4, tile_size=4, tile_overlap=1,
                         num_inference_steps=2, decode_chunk_size=2)
    f32 = generate(models, params, ref_image, pose, face, cfg,
                   rng=jax.random.PRNGKey(15))
    u8 = generate(models, params, ref_image, pose, face,
                  dataclasses.replace(cfg, output_uint8=True),
                  rng=jax.random.PRNGKey(15))
    assert u8.dtype == jnp.uint8
    host = np.stack(frames_to_uint8(np.asarray(f32, np.float32)))
    diff = np.abs(np.asarray(u8).astype(np.int16) - host.astype(np.int16))
    assert diff.max() <= 1, diff.max()
    # pass-through: uint8 input comes back as a list of uint8 frames
    back = frames_to_uint8(np.asarray(u8))
    assert back[0].dtype == np.uint8 and len(back) == 4


def test_resolve_steps_per_dispatch_policy():
    from stableanimator_tpu.pipeline import resolve_steps_per_dispatch

    def cfg(frames, **kw):
        return PipelineConfig(num_frames=frames, tile_size=16, tile_overlap=4,
                              **kw)

    assert resolve_steps_per_dispatch(cfg(16)) is None     # single tile
    assert resolve_steps_per_dispatch(cfg(52)) is None     # 4 tiles
    assert resolve_steps_per_dispatch(cfg(64)) == 5        # 5 slots/step
    # 15 s demo video: 38 tile-slots/step -> 1 step per dispatch
    # (a 5-step segment at this scale = ~57 s device execution = watchdog)
    assert resolve_steps_per_dispatch(cfg(450)) == 1
    assert resolve_steps_per_dispatch(
        cfg(16, steps_per_dispatch=7)) == 7                # explicit wins
    assert resolve_steps_per_dispatch(
        cfg(450, steps_per_dispatch=None)) is None         # explicit opt-out


def test_decode_frames_uneven_chunks(tiny_setup):
    """f not divisible by decode_chunk_size must decode the remainder as its
    own small chunk (round-1 bug: it silently decoded the whole video in one
    batch — the OOM case the chunking exists to avoid). Batched and
    sequential paths must agree."""
    from stableanimator_tpu.pipeline.animation import decode_frames

    models, params = tiny_setup
    rng = np.random.default_rng(3)
    latents = jnp.asarray(rng.normal(size=(1, 6, 8, 8, 4)), jnp.float32)

    cfg_batched = PipelineConfig(decode_chunk_size=4)
    cfg_seq = dataclasses.replace(cfg_batched, batched_decode_max_latent_volume=1)

    batched = np.asarray(decode_frames(models, params, latents, cfg_batched))
    seq = np.asarray(decode_frames(models, params, latents, cfg_seq))
    assert batched.shape == (6, 64, 64, 3)
    assert np.isfinite(batched).all()
    np.testing.assert_allclose(batched, seq, rtol=2e-5, atol=2e-5)

    # chunking semantics: frames grouped [0..3] then [4..5], matching the
    # reference's uneven tail chunk
    def decode(zc, nf):
        return models.vae.apply({"params": params["vae"]},
                                zc / models.vae.config.scaling_factor,
                                num_frames=nf, method=models.vae.decode)

    manual = jnp.concatenate([decode(latents[0, :4], 4), decode(latents[0, 4:], 2)])
    manual = np.clip(np.asarray(manual, np.float32) / 2.0 + 0.5, 0.0, 1.0)
    np.testing.assert_allclose(batched, manual, rtol=2e-5, atol=2e-5)
