"""The end-to-end animation pipeline as one jitted program.

Re-expresses reference animation/pipelines/inference_pipeline_animation.py
(InferenceAnimationPipeline.__call__, :443-710) TPU-first:

  * the 25-step denoising loop is a single lax.scan — no Python-level loop
    survives compilation (reference: Python for-loop at :642),
  * classifier-free guidance AND all temporal tiles are batched into ONE
    UNet call per step (reference: two sequential UNet calls per tile,
    :663-685) — proved numerically identical in tests/test_models_parity.py,
  * PoseNet runs once per video, outside the scan (the reference recomputes
    it every timestep at :661; it is timestep-independent),
  * the overlap-blend is a static scatter-add with precomputed triangular
    weights and count normalisation (:654-689),
  * VAE decode batches the decode chunks instead of looping (:319-357),
  * scheduler state stays float32; UNet compute is bf16 on TPU.

Inputs/outputs are channels-last numpy/jax arrays; PIL/file handling lives
in cli/.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

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
    EulerEDMSchedule,
    make_schedule,
    scale_model_input,
    step_euler,
)
from stableanimator_tpu.diffusion.tiling import (
    auto_tile_batch,
    tile_blend_weight,
    tile_indices,
)
from stableanimator_tpu.models.clip import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    CLIPVisionModelWithProjection,
)
from stableanimator_tpu.models.id_encoder import FusionFaceId
from stableanimator_tpu.models.pose_net import PoseNet
from stableanimator_tpu.models.unet import UNetSpatioTemporal
from stableanimator_tpu.models.vae import AutoencoderKLTemporalDecoder
from stableanimator_tpu.ops.resize import resize_antialias


class AnimationModels(NamedTuple):
    """Static module definitions (hashable; safe as a jit static arg)."""

    unet: UNetSpatioTemporal
    vae: AutoencoderKLTemporalDecoder
    clip: CLIPVisionModelWithProjection
    pose_net: PoseNet
    face_encoder: FusionFaceId


def build_models(
    unet_cfg: UNetConfig | None = None,
    vae_cfg: VAEConfig | None = None,
    clip_cfg: CLIPVisionConfig | None = None,
    pose_cfg: PoseNetConfig | None = None,
    face_cfg: FaceEncoderConfig | None = None,
    dtype=jnp.bfloat16,
    use_flash: Optional[bool] = None,
    quant: bool = False,
    remat: bool = False,
) -> AnimationModels:
    return AnimationModels(
        unet=UNetSpatioTemporal(unet_cfg or UNetConfig(), use_flash=use_flash,
                                quant=quant, remat=remat, dtype=dtype),
        vae=AutoencoderKLTemporalDecoder(vae_cfg or VAEConfig(), dtype=dtype),
        clip=CLIPVisionModelWithProjection(clip_cfg or CLIPVisionConfig(),
                                           dtype=dtype),
        pose_net=PoseNet(pose_cfg or PoseNetConfig(), dtype=dtype),
        face_encoder=FusionFaceId(face_cfg or FaceEncoderConfig(), dtype=dtype),
    )


def init_params(models: AnimationModels, rng, height: int = 64, width: int = 64,
                num_frames: int = 2) -> dict:
    """Random-init the full parameter set (tests / training-from-scratch).
    Real checkpoints come from convert/torch_to_jax.py."""
    ks = jax.random.split(rng, 5)
    h8, w8 = height // 8, width // 8
    ucfg = models.unet.config
    fcfg = models.face_encoder.config
    ccfg = models.clip.config
    unet_p = models.unet.init(
        ks[0],
        jnp.zeros((1, num_frames, h8, w8, ucfg.in_channels)),
        jnp.float32(0.0),
        jnp.zeros((1, 1 + ucfg.num_id_tokens, ucfg.cross_attention_dim)),
        jnp.zeros((1, 3)),
        jnp.zeros((num_frames, h8, w8, ucfg.block_out_channels[0])),
    )
    vae_p = models.vae.init(ks[1], jnp.zeros((1, height, width, 3)), num_frames=1)
    clip_p = models.clip.init(
        ks[2], jnp.zeros((1, ccfg.image_size, ccfg.image_size, 3)))
    pose_p = models.pose_net.init(ks[3], jnp.zeros((1, height, width, 3)))
    face_p = models.face_encoder.init(
        ks[4], jnp.zeros((1, fcfg.id_embeddings_dim)),
        jnp.zeros((1, 1, fcfg.clip_embeddings_dim)))
    return {
        "unet": unet_p["params"],
        "vae": vae_p["params"],
        "clip": clip_p["params"],
        "pose_net": pose_p["params"],
        "face_encoder": face_p["params"],
    }


def fast_init_params(models: AnimationModels, height: int = 64,
                     width: int = 64, num_frames: int = 2) -> dict:
    """Shape-only parameter init: `jax.eval_shape` over the real init graphs
    (abstract eval — no compile, no execution), then fill each leaf with
    small deterministic values. Orders of magnitude faster than eager
    `init_params` (which compiles every init op); for tests / dryruns /
    benchmarks where the *statistics* of the init don't matter — anything
    comparing two numerical paths under the same params, validating
    shardings, or timing compiled steps. Not for training from scratch
    (zero-init output layers and fan-in scaling matter there)."""
    shapes = jax.eval_shape(
        lambda: init_params(models, jax.random.PRNGKey(0),
                            height=height, width=width,
                            num_frames=num_frames))
    counter = [0]

    def fill(path, s):
        # normalisation scales start at 1 and biases at 0 (as real init
        # does) so norms behave sanely and gradients flow at real magnitude
        name = str(path[-1]) if path else ""
        dt = np.dtype(s.dtype)
        if "scale" in name:
            return np.ones(s.shape, dt)
        if "bias" in name:
            return np.zeros(s.shape, dt)
        counter[0] += 1
        if len(s.shape) >= 2:
            # lecun-style fan-in scaling (flax kernels are [..., in, out]):
            # keeps activation magnitudes realistic through deep stacks
            std = 1.0 / np.sqrt(max(int(np.prod(s.shape[:-1])), 1))
        else:
            std = 0.05
        # per-leaf uniform(±sqrt(3)*std): zero-mean, matched variance, and
        # fully DEcorrelated across leaves — tiling a shared pool makes
        # different layers share weights, which coherently amplifies fp32
        # reduction-order noise ~70x in batched-vs-serial parity tests.
        # float32 uniform draws are ~5x faster than Gaussian ziggurat
        # (matters at full model scale: ~2.3B values).
        rng = np.random.default_rng(counter[0])
        flat = rng.random(int(np.prod(s.shape)) if s.shape else 1,
                          dtype=np.float32)
        flat = (flat - 0.5) * np.float32(2.0 * np.sqrt(3.0) * std)
        return flat.reshape(s.shape).astype(dt)

    # host (numpy) leaves on purpose: a per-leaf device transfer over the
    # remote-TPU tunnel costs an RTT each; callers hand the whole tree to a
    # jitted function (or one jax.device_put), which transfers in bulk.
    return jax.tree_util.tree_map_with_path(fill, shapes)


def device_fill_params(models: AnimationModels, height: int = 64,
                       width: int = 64, num_frames: int = 2,
                       cast_fp32_to=None, seed: int = 0) -> dict:
    """`fast_init_params` statistics, but built ON DEVICE by one jitted
    graph — zero host->device parameter traffic.

    Exists for benchmarking against the remote (axon) TPU tunnel, where
    uploading the ~4.6 GB bf16 tree runs at ~7 MB/s (~11 minutes — measured;
    it was the real cost hiding inside bench.py's "warmup"). The fill graph
    is a few hundred RNG ops (tiny HLO, persisted in the compile cache), and
    the parameters never leave the device. Same per-leaf rules as
    fast_init_params: norm scales 1, biases 0, everything else decorrelated
    uniform(±sqrt(3)·std) with fan-in std.

    cast_fp32_to: optional dtype (e.g. jnp.bfloat16) applied to fp32 leaves.
    """
    shapes = jax.eval_shape(
        lambda: init_params(models, jax.random.PRNGKey(0),
                            height=height, width=width,
                            num_frames=num_frames))
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    def fill(key):
        keys = jax.random.split(key, len(flat))
        leaves = []
        for k, (path, s) in zip(keys, flat):
            name = str(getattr(path[-1], "key", path[-1])) if path else ""
            dt = s.dtype
            if cast_fp32_to is not None and dt == jnp.float32:
                dt = cast_fp32_to
            if not jnp.issubdtype(dt, jnp.floating):
                leaves.append(jnp.zeros(s.shape, dt))
            elif "scale" in name:
                leaves.append(jnp.ones(s.shape, dt))
            elif "bias" in name:
                leaves.append(jnp.zeros(s.shape, dt))
            else:
                if len(s.shape) >= 2:
                    std = 1.0 / float(np.sqrt(max(
                        int(np.prod(s.shape[:-1])), 1)))
                else:
                    std = 0.05
                lim = float(np.sqrt(3.0)) * std
                leaves.append(jax.random.uniform(
                    k, s.shape, dt, minval=-lim, maxval=lim))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return jax.jit(fill)(jax.random.PRNGKey(seed))


# ---------------------------------------------------------------------------
# conditioning
# ---------------------------------------------------------------------------

def encode_conditioning(models: AnimationModels, params, ref_image,
                        face_embedding, rng, cfg: PipelineConfig,
                        clip_image=None):
    """CLIP + face-ID + VAE reference conditioning.

    ref_image: [1, H, W, 3] float32 in [0, 1] at the generation resolution
    clip_image: optional [1, H0, W0, 3] in [0, 1] for the CLIP branch — the
      reference feeds CLIP the *original-size* image while the VAE branch
      gets the resized one (inference_pipeline_animation.py:520 vs :542)
    face_embedding: [1, id_dim] ArcFace embedding
    Returns (context [2, 1+num_id, cross_dim], image_latents [2, h, w, 4],
    add_time_ids [2, 3]); index 0 is the uncond stream.
    (reference inference_pipeline_animation.py:520-578)
    """
    ccfg = models.clip.config
    # CLIP branch: antialiased resize in [-1,1], then CLIP normalisation
    # (reference :202-220)
    x = (clip_image if clip_image is not None else ref_image) * 2.0 - 1.0
    x = resize_antialias(x, ccfg.image_size, ccfg.image_size)
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_IMAGE_MEAN, x.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, x.dtype)
    clip_embed = models.clip.apply({"params": params["clip"]}, (x - mean) / std)
    clip_embed = clip_embed[:, None, :].astype(jnp.float32)  # [1, 1, 1024]

    # face tokens (reference :529-540)
    faceid = models.face_encoder.apply(
        {"params": params["face_encoder"]},
        face_embedding.astype(clip_embed.dtype), clip_embed).astype(jnp.float32)
    cond_ctx = jnp.concatenate([clip_embed, faceid], axis=1)
    context = jnp.concatenate([jnp.zeros_like(cond_ctx), cond_ctx], axis=0)

    # VAE reference latent with noise augmentation, fp32 encode
    # (reference :542-566)
    vae_in = ref_image * 2.0 - 1.0
    noise = jax.random.normal(rng, vae_in.shape, jnp.float32)
    vae_in = vae_in + cfg.noise_aug_strength * noise
    moments = models.vae.apply({"params": params["vae"]}, vae_in,
                               method=models.vae.encode)
    lat = moments.mode().astype(jnp.float32)  # [1, h, w, 4]
    image_latents = jnp.concatenate([jnp.zeros_like(lat), lat], axis=0)

    add_time_ids = jnp.asarray(
        [[cfg.fps - 1, cfg.motion_bucket_id, cfg.noise_aug_strength]], jnp.float32)
    add_time_ids = jnp.concatenate([add_time_ids, add_time_ids], axis=0)
    return context, image_latents, add_time_ids


# ---------------------------------------------------------------------------
# denoising
# ---------------------------------------------------------------------------

def denoise(models: AnimationModels, params, latents, context, image_latents,
            add_time_ids, pose_latents, schedule: EulerEDMSchedule,
            cfg: PipelineConfig, face_opt=None, mesh=None,
            step_start=0, num_steps: int | None = None):
    """Scan the Euler steps; CFG and tiles batched into one UNet call.

    latents:       [1, F, h, w, 4] float32 (already scaled by init sigma)
    context:       [2, 1+num_id, cross_dim]   (0 = uncond)
    image_latents: [2, h, w, 4]               (0 = uncond = zeros)
    pose_latents:  [F, h, w, c0]
    face_opt:      optional pipeline.face_opt.FaceOptimizer — runs the HJB
                   identity-refinement inner solver on x0_hat each step.
    mesh:          optional jax.sharding.Mesh — shards the UNet batch
                   (CFG x tiles) over "data" and the tile frame axis over
                   "frame"; GSPMD inserts the cross-frame collectives.
    step_start:    first schedule index to run (int or traced scalar); with
                   `num_steps` (static) this scans steps
                   [step_start, step_start+num_steps) — the segmented
                   long-video dispatch reuses one compiled segment program
                   by tracing the offset.
    num_steps:     how many steps to scan (static); None = the full schedule.
    """
    f = latents.shape[1]
    tiles_np = tile_indices(f, cfg.tile_size, cfg.tile_overlap)
    tiles = jnp.asarray(tiles_np)
    n_tiles = tiles.shape[0]
    weights = tile_blend_weight(cfg.tile_size)
    counts = np.zeros((f,), np.float32)
    np.add.at(counts, tiles_np.reshape(-1), np.tile(weights, n_tiles))
    counts_j = jnp.asarray(counts)
    weights_j = jnp.asarray(weights)

    # per-frame guidance ramp (reference :604-609)
    guidance = jnp.linspace(cfg.min_guidance_scale, cfg.max_guidance_scale, f,
                            dtype=jnp.float32)[None, :, None, None, None]

    mtb = (auto_tile_batch(f, cfg.tile_size, cfg.tile_overlap)
           if cfg.max_tile_batch == "auto" else cfg.max_tile_batch)
    if mesh is not None and mtb is not None:
        # under a mesh the grouped UNet batch must be [2, T, ...] — i.e.
        # groups of ONE tile — so the CFG axis exactly matches the "data"
        # mesh axis. At 2g > data size GSPMD abandons the sequence-parallel
        # reshard around every temporal block and all-gathers the frame
        # axis instead (measured on the lowered 450f segment: 2.25 GB of
        # frame all-gathers per group call at g=2 vs ZERO at g=1; the
        # per-call collectives are then only the temporal-conv halo
        # permutes, same as the flat path).
        mtb = 1
    n_scan = (schedule.timesteps.shape[0] if num_steps is None else num_steps)
    steps_iter = step_start + jnp.arange(n_scan)

    if mtb is not None and mtb < n_tiles:
        return _denoise_grouped(
            models, params, latents, context, image_latents, add_time_ids,
            pose_latents, schedule, cfg, mtb, tiles_np, weights_j, counts_j,
            guidance, face_opt=face_opt, mesh=mesh, steps_iter=steps_iter)

    # static per-tile conditioning
    pose_tiles = pose_latents[tiles.reshape(-1)]          # [n*T, h, w, c0]
    pose_batch = jnp.concatenate(
        [jnp.zeros_like(pose_tiles), pose_tiles], axis=0)  # uncond gets zeros
    ctx_batch = jnp.concatenate([
        jnp.repeat(context[:1], n_tiles, axis=0),
        jnp.repeat(context[1:], n_tiles, axis=0),
    ], axis=0)                                             # [2n, 1+id, D]
    ids_batch = jnp.concatenate([
        jnp.repeat(add_time_ids[:1], n_tiles, axis=0),
        jnp.repeat(add_time_ids[1:], n_tiles, axis=0),
    ], axis=0)                                             # [2n, 3]
    img_cond = image_latents[1]                            # [h, w, 4]

    def step(lat, i):
        sigma = schedule.sigmas[i]
        sigma_next = schedule.sigmas[i + 1]
        t = schedule.timesteps[i]

        lat_in = scale_model_input(lat, sigma)             # [1, F, h, w, 4]
        x_tiles = lat_in[0][tiles]                         # [n, T, h, w, 4]
        tile_shape = x_tiles.shape
        img_u = jnp.zeros(tile_shape[:-1] + (img_cond.shape[-1],), x_tiles.dtype)
        img_c = jnp.broadcast_to(img_cond, tile_shape[:-1] + (img_cond.shape[-1],))
        x_u = jnp.concatenate([x_tiles, img_u], axis=-1)
        x_c = jnp.concatenate([x_tiles, img_c], axis=-1)
        batch = jnp.concatenate([x_u, x_c], axis=0)        # [2n, T, h, w, 8]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch = jax.lax.with_sharding_constraint(
                batch, NamedSharding(mesh, P("data", "frame")))

        out = models.unet.apply(
            {"params": params["unet"]}, batch, t, ctx_batch, ids_batch,
            pose_batch,
        ).astype(jnp.float32)                              # [2n, T, h, w, 4]

        out = out * weights_j[None, :, None, None, None]
        flat_idx = tiles.reshape(-1)

        def blend(tile_out):                               # [n, T, h, w, 4]
            acc = jnp.zeros((f,) + tile_out.shape[2:], jnp.float32)
            acc = acc.at[flat_idx].add(tile_out.reshape((-1,) + tile_out.shape[2:]))
            return acc / counts_j[:, None, None, None]

        noise_uncond = blend(out[:n_tiles])
        noise_cond = blend(out[n_tiles:])
        noise_pred = noise_uncond + guidance[0] * (noise_cond - noise_uncond)
        lat = _advance_latents(lat, noise_pred, sigma, sigma_next, i, face_opt)
        return lat, None

    latents, _ = jax.lax.scan(step, latents, steps_iter)
    return latents


def _advance_latents(lat, noise_pred, sigma, sigma_next, i, face_opt):
    """One Euler update (optionally through the HJB face-opt inner solver)."""
    if face_opt is not None and face_opt.cfg.steps > 0:
        from stableanimator_tpu.diffusion.scheduler import (
            pred_original_sample,
            step_euler_from_x0,
        )

        x0 = pred_original_sample(noise_pred[None], lat, sigma)
        x0 = face_opt.refine(x0, i)
        return step_euler_from_x0(x0, lat, sigma, sigma_next)
    return step_euler(noise_pred[None], lat, sigma, sigma_next)


def _denoise_grouped(models, params, latents, context, image_latents,
                     add_time_ids, pose_latents, schedule, cfg: PipelineConfig,
                     group_size, tiles_np, weights_j, counts_j, guidance,
                     face_opt=None, mesh=None, steps_iter=None):
    """Long-video denoise: scan over groups of `group_size` tiles.

    Same math as the all-tiles-batched path in `denoise` (each tile's UNet
    output is weighted, scatter-added and count-normalised), but the UNet
    batch per call is bounded at 2 x max_tile_batch tile-slices, so HBM use
    is independent of video length — the TPU shape of the reference's
    per-tile Python loop (inference_pipeline_animation.py:654-689). The
    tile set is padded to a multiple of the group size with zero-weight
    duplicates of the last tile so every group has a static shape.
    """
    f = latents.shape[1]
    n_tiles, tile = tiles_np.shape
    g = group_size
    n_groups = -(-n_tiles // g)
    pad = n_groups * g - n_tiles
    tiles_p = np.concatenate(
        [tiles_np, np.repeat(tiles_np[-1:], pad, axis=0)], axis=0)
    mask_p = np.concatenate(
        [np.ones((n_tiles,), np.float32), np.zeros((pad,), np.float32)])
    mask_g = jnp.asarray(mask_p.reshape(n_groups, g))

    # gather the per-group pose latents ONCE, outside the step scan, and
    # feed them as scan xs. The previous formulation gathered
    # pose_latents[tg] inside the group scan body: per-call gather traffic
    # single-chip, and under a mesh SPMD all-gathered the ENTIRE
    # frame-sharded pose table every group call (lowered: 2.36 GB x 19
    # groups x 25 steps ~ 1.07 TB of all-gathers at 450f; this hoist makes
    # the exchange one gather per program). [n_groups, g, T, h, w, c0],
    # the T axis sharded like the UNet batch's frame axis.
    pose_groups = pose_latents[tiles_p.reshape(-1)].reshape(
        (n_groups, g, tile) + pose_latents.shape[1:])
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        pose_groups = jax.lax.with_sharding_constraint(
            pose_groups, NamedSharding(mesh, P(None, None, "frame")))

    # group-constant conditioning: [2g, ...] with uncond halves first, like
    # the batched path (uncond drops the pose AND carries the zeroed face
    # tokens baked into context[0]; reference :663-671)
    ctx_pair = jnp.concatenate([
        jnp.repeat(context[:1], g, axis=0),
        jnp.repeat(context[1:], g, axis=0),
    ], axis=0)
    ids_pair = jnp.concatenate([
        jnp.repeat(add_time_ids[:1], g, axis=0),
        jnp.repeat(add_time_ids[1:], g, axis=0),
    ], axis=0)
    img_cond = image_latents[1]

    def step(lat, i):
        sigma = schedule.sigmas[i]
        sigma_next = schedule.sigmas[i + 1]
        t = schedule.timesteps[i]

        lat_in = scale_model_input(lat, sigma)[0]          # [F, h, w, 4]

        # gather ALL tile inputs in one constant-index gather per step and
        # feed them as scan xs; the while body then reads its slab with a
        # dynamic-slice. Keeping the gather (traced tg indices), the two
        # scatter-adds, and the 2x[F,h,w,4] fp32 carried accumulators
        # INSIDE the body measured ~40 ms/tile-slot of overhead vs the flat
        # path (profile r3d6); outputs now leave the scan as stacked ys and
        # one constant-index scatter-add per step does the blend.
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # replicate the (small) scaled latents BEFORE the tile gather:
            # the gather's overlapping tile windows cross frame-shard
            # boundaries, and GSPMD otherwise resolves the gather->reshard
            # chain by fully rematerialising the [G,g,T,h,w,4] result
            # (~320 MB/step at 450f, SPMD "involuntary full
            # rematerialization"); replicating the 30 MB source makes the
            # gather + frame partition purely local
            lat_in = jax.lax.with_sharding_constraint(
                lat_in, NamedSharding(mesh, P()))
        x_groups = lat_in[tiles_p.reshape(-1)].reshape(
            (n_groups, g, tile) + lat_in.shape[1:])        # [G, g, T, h, w, 4]
        if mesh is not None:
            x_groups = jax.lax.with_sharding_constraint(
                x_groups, NamedSharding(mesh, P(None, None, "frame")))

        def tile_group(_, xs):
            x_t, mg, pose_gs = xs                          # [g,T,...], [g], [g,T,...]
            img_u = jnp.zeros(x_t.shape[:-1] + (img_cond.shape[-1],), x_t.dtype)
            img_c = jnp.broadcast_to(
                img_cond, x_t.shape[:-1] + (img_cond.shape[-1],))
            batch = jnp.concatenate([
                jnp.concatenate([x_t, img_u], axis=-1),
                jnp.concatenate([x_t, img_c], axis=-1),
            ], axis=0)                                     # [2g, T, h, w, 8]
            pose_g = pose_gs.reshape((-1,) + pose_gs.shape[2:])
            pose_b = jnp.concatenate(
                [jnp.zeros_like(pose_g), pose_g], axis=0)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                batch = jax.lax.with_sharding_constraint(
                    batch, NamedSharding(mesh, P("data", "frame")))
                # (the [g*T,h,w,c0] pose slab still de-shards at its
                # reshape — one 84 MB f32 gather per group call, ~80 GB
                # over the 450f demo; pinning pose_g/pose_b only relocates
                # the gather to the constraint, so it is left to GSPMD.
                # ~0.9 s of the v5e-8 estimate — known headroom.)

            out = models.unet.apply(
                {"params": params["unet"]}, batch, t, ctx_pair, ids_pair,
                pose_b,
            ).astype(jnp.float32)                          # [2g, T, h, w, 4]

            # triangular blend weight x padding mask (padded tiles -> 0)
            wm = (weights_j[None, :] *
                  jnp.concatenate([mg, mg])[:, None])[:, :, None, None, None]
            return None, out * wm

        _, outs = jax.lax.scan(                            # [G, 2g, T, h, w, 4]
            tile_group, None, (x_groups, mask_g, pose_groups))
        flat_idx = tiles_p.reshape(-1)                     # constant indices
        frame_shape = (-1,) + outs.shape[3:]
        acc_u = jnp.zeros((f,) + lat.shape[2:], jnp.float32).at[flat_idx].add(
            outs[:, :g].reshape(frame_shape))
        acc_c = jnp.zeros((f,) + lat.shape[2:], jnp.float32).at[flat_idx].add(
            outs[:, g:].reshape(frame_shape))
        noise_uncond = acc_u / counts_j[:, None, None, None]
        noise_cond = acc_c / counts_j[:, None, None, None]
        noise_pred = noise_uncond + guidance[0] * (noise_cond - noise_uncond)
        lat = _advance_latents(lat, noise_pred, sigma, sigma_next, i, face_opt)
        return lat, None

    if steps_iter is None:
        steps_iter = jnp.arange(schedule.timesteps.shape[0])
    latents, _ = jax.lax.scan(step, latents, steps_iter)
    return latents


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_frames(models: AnimationModels, params, latents, cfg: PipelineConfig,
                  mesh=None):
    """Chunked temporal-VAE decode, chunks batched (reference :319-357);
    with a mesh the chunk batch shards over all devices (frame-parallel
    decode replacing the reference's serial chunk loop).
    latents [1, F, h, w, 4] -> frames [F, H, W, 3] float32 in [0, 1]."""
    f = latents.shape[1]
    chunk = min(cfg.decode_chunk_size, f)
    rem = f % chunk
    full = f - rem
    z = latents[0] / models.vae.config.scaling_factor

    def decode(zc, nf):
        return models.vae.apply({"params": params["vae"]}, zc,
                                 num_frames=nf, method=models.vae.decode)

    if mesh is not None:
        # multi-chip: chunks shard across devices, decode them all at once
        from jax.sharding import NamedSharding, PartitionSpec as P

        z = jax.lax.with_sharding_constraint(
            z, NamedSharding(mesh, P(("data", "frame"))))
        frames = decode(z, chunk) if rem == 0 else jnp.concatenate(
            [decode(z[:full], chunk), decode(z[full:], rem)])
    elif f * latents.shape[2] * latents.shape[3] <= cfg.batched_decode_max_latent_volume:
        # small enough to decode every chunk in one batch (fastest); the
        # remainder chunk (if any) decodes as its own smaller batch, exactly
        # like the reference's uneven tail chunk
        # (inference_pipeline_animation.py:338)
        frames = decode(z, chunk) if rem == 0 else jnp.concatenate(
            [decode(z[:full], chunk), decode(z[full:], rem)])
    else:
        # single chip, large output: decode chunks sequentially like the
        # reference (inference_pipeline_animation.py:338) — at 576x1024 the
        # batched decoder's level-0 activations alone exceed HBM
        frames = jax.lax.map(lambda zc: decode(zc, chunk),
                             z[:full].reshape(full // chunk, chunk, *z.shape[1:]))
        frames = frames.reshape(full, *frames.shape[2:])
        if rem:
            frames = jnp.concatenate([frames, decode(z[full:], rem)])
    frames = frames.astype(jnp.float32)
    frames = jnp.clip(frames / 2.0 + 0.5, 0.0, 1.0)
    if cfg.output_uint8:
        # utils/image.py::frames_to_uint8 semantics (round half up) on device
        frames = jnp.clip(frames * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
    return frames


# ---------------------------------------------------------------------------
# full generation
# ---------------------------------------------------------------------------

def _u8_to_unit(x):
    """uint8 pixels -> [0,1] fp32 ON DEVICE (dtype is static at trace
    time). Callers may ship uint8 across the host->device boundary — 1/4
    the transfer bytes. XLA compiles the division as multiply-by-
    reciprocal, so values sit within 1 ulp of utils/image.py's host-side
    conversion (asserted to output-noise level in test_pipeline)."""
    if x is not None and x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


def _u8_to_sym(x):
    """uint8 pixels -> [-1,1] fp32 on device (poses_to_array convention)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 127.5 - 1.0
    return x


def _generate_impl(models, params, ref_image, pose_pixels, face_embedding,
                   cfg: PipelineConfig, rng, face_opt=None, mesh=None,
                   clip_image=None):
    # publish the mesh for the temporal blocks' sequence-parallel
    # resharding hints — set HERE (trace time) so direct _generate_impl
    # callers (tests, tools) get it too, not only pipeline.generate()
    if mesh is None:
        return _generate_body(models, params, ref_image, pose_pixels,
                              face_embedding, cfg, rng, face_opt, mesh,
                              clip_image)
    from stableanimator_tpu.ops.gate import ACTIVE_MESH

    tok = ACTIVE_MESH.set(mesh)
    try:
        return _generate_body(models, params, ref_image, pose_pixels,
                              face_embedding, cfg, rng, face_opt, mesh,
                              clip_image)
    finally:
        ACTIVE_MESH.reset(tok)


def _prepare_denoise_state(models, params, ref_image, pose_pixels,
                           face_embedding, cfg: PipelineConfig, rng,
                           clip_image=None):
    """Everything before the Euler loop: conditioning, pose latents, initial
    noise. Returns (latents, context, image_latents, add_time_ids,
    pose_latents) — the full carried state of the denoise loop."""
    ref_image = _u8_to_unit(ref_image)
    clip_image = _u8_to_unit(clip_image)
    pose_pixels = _u8_to_sym(pose_pixels)
    f = pose_pixels.shape[0]
    rngs = jax.random.split(rng, 3)

    context, image_latents, add_time_ids = encode_conditioning(
        models, params, ref_image, face_embedding, rngs[0], cfg,
        clip_image=clip_image)

    # pose latents once per video (timestep-independent)
    pose_latents = models.pose_net.apply(
        {"params": params["pose_net"]}, pose_pixels).astype(jnp.float32)

    # initial noise: one tile of noise, repeated across the video
    # (reference :586-597)
    h8, w8 = ref_image.shape[1] // 8, ref_image.shape[2] // 8
    schedule = make_schedule(cfg.num_inference_steps, SchedulerConfig())
    noise = jax.random.normal(rngs[1], (1, cfg.tile_size, h8, w8, 4), jnp.float32)
    noise = noise * schedule.init_noise_sigma
    reps = f // cfg.tile_size + 1
    latents = jnp.tile(noise, (1, reps, 1, 1, 1))[:, :f]
    return latents, context, image_latents, add_time_ids, pose_latents


def _generate_body(models, params, ref_image, pose_pixels, face_embedding,
                   cfg: PipelineConfig, rng, face_opt, mesh, clip_image):
    latents, context, image_latents, add_time_ids, pose_latents = (
        _prepare_denoise_state(models, params, ref_image, pose_pixels,
                               face_embedding, cfg, rng, clip_image))
    schedule = make_schedule(cfg.num_inference_steps, SchedulerConfig())
    latents = denoise(models, params, latents, context, image_latents,
                      add_time_ids, pose_latents, schedule, cfg,
                      face_opt=face_opt, mesh=mesh)
    return decode_frames(models, params, latents, cfg, mesh=mesh)


# face_opt (argnum 7) is a TRACED pytree (FaceOptimizer registers target/
# boxes as leaves, cfg+callables as static aux): one cache entry per
# optimizer structure, shared between warm_generate and generate
_generate_jit = jax.jit(_generate_impl, static_argnums=(0, 5, 8))

_prep_jit = jax.jit(_prepare_denoise_state, static_argnums=(0, 5))


def _denoise_segment(models, params, latents, context, image_latents,
                     add_time_ids, pose_latents, cfg: PipelineConfig,
                     step_start, num_steps: int, mesh):
    """`num_steps` Euler steps from schedule index `step_start` (traced), plus
    the advanced offset — one compiled program serves every segment, and the
    offset round-trips as a device scalar so segment dispatch moves no
    host->device data (a scalar upload costs an ~0.3 s RTT on remote TPUs)."""
    schedule = make_schedule(cfg.num_inference_steps, SchedulerConfig())
    latents = denoise(models, params, latents, context, image_latents,
                      add_time_ids, pose_latents, schedule, cfg, mesh=mesh,
                      step_start=step_start, num_steps=num_steps)
    return latents, step_start + num_steps


_segment_jit = jax.jit(_denoise_segment, static_argnums=(0, 7, 9, 10))


def _denoise_segment_fo(models, params, latents, context, image_latents,
                        add_time_ids, pose_latents, face_opt,
                        cfg: PipelineConfig, step_start, num_steps: int,
                        mesh):
    """Segment program with the HJB face-opt inner solver fused into each
    Euler step. face_opt is a traced pytree argument (FaceOptimizer leaves =
    target embedding + per-frame face boxes; its cfg and callables are the
    static part of the jit key) — ONE compiled program serves every
    optimizer built from the same callables, so warm_generate(face_opt=...)
    with placeholder boxes warms exactly this program."""
    schedule = make_schedule(cfg.num_inference_steps, SchedulerConfig())
    latents = denoise(models, params, latents, context, image_latents,
                      add_time_ids, pose_latents, schedule, cfg,
                      face_opt=face_opt, mesh=mesh,
                      step_start=step_start, num_steps=num_steps)
    return latents, step_start + num_steps


_segment_fo_jit = jax.jit(_denoise_segment_fo, static_argnums=(0, 8, 10, 11))


def _make_face_opt_segment_jit(face_opt):
    """_segment_jit-signature adapter binding `face_opt` (see
    _denoise_segment_fo; kept so _generate_segmented treats both segment
    programs uniformly)."""

    def seg(models, params, latents, context, image_latents, add_time_ids,
            pose_latents, cfg: PipelineConfig, step_start, num_steps: int,
            mesh):
        return _segment_fo_jit(models, params, latents, context,
                               image_latents, add_time_ids, pose_latents,
                               face_opt, cfg, step_start, num_steps, mesh)

    return seg

_decode_jit = jax.jit(decode_frames, static_argnums=(0, 3, 4))


def _decode_group(models, params, latents, start, cfg: PipelineConfig,
                  group: int, mesh):
    """Decode `group` frames from (traced) frame index `start` — the
    host-dispatched decode unit of the segmented path. `group` is a multiple
    of decode_chunk_size, so the chunk boundaries (and therefore the
    temporal decoder's conv context per chunk) are identical to the
    single-program decode. Returns (frames, advanced offset) so the offset
    round-trips as a device scalar (no per-group host->device upload)."""
    z = jax.lax.dynamic_slice_in_dim(latents, start, group, axis=1)
    return decode_frames(models, params, z, cfg, mesh=mesh), start + group


_decode_group_jit = jax.jit(_decode_group, static_argnums=(0, 4, 5, 6))


def _decode_dispatched(models, params, latents, cfg: PipelineConfig, mesh):
    """Decode in bounded host-dispatched groups when the video is large.

    A long video's batched-or-scanned decode is otherwise ONE device
    execution that grows linearly with frame count (~100 s at 450 frames,
    512^2) — the same remote-worker watchdog surface the segmented denoise
    exists for. Groups are `decode_chunk_size` multiples sized by the
    existing batched_decode_max_latent_volume knob, so every group decodes
    as one batched VAE call and chunk semantics match the single-program
    path exactly (asserted in test_pipeline)."""
    f = latents.shape[1]
    chunk = min(cfg.decode_chunk_size, f)
    h8, w8 = latents.shape[2], latents.shape[3]
    per = chunk * max(1, cfg.batched_decode_max_latent_volume // max(chunk * h8 * w8, 1))
    if mesh is not None or f <= per:
        return _decode_jit(models, params, latents, cfg, mesh)
    outs = []
    i = 0
    start = jnp.zeros((), jnp.int32)
    while i < f:
        g = min(per, f - i)
        out, start = _decode_group_jit(models, params, latents, start, cfg,
                                       g, mesh)
        outs.append(out)
        i += g
    # fetch per group IN DISPATCH ORDER and concatenate on host: every
    # dispatch above was async, so group 0's device->host transfer starts
    # after ~one group of decode and overlaps the rest of the device work
    # (a single np.asarray of the device concat cannot begin until ALL
    # groups finish — measured ~20 s serial fetch after an 11 s decode for
    # 450 uint8 frames at 512^2 through the remote tunnel; the overlap
    # hides most of the shorter of the two). Long-video generate therefore
    # returns a HOST array; callers np.asarray the result either way.
    return np.concatenate([np.asarray(o) for o in outs], axis=0)


def _phase_mark(name: str, t0: float, arr) -> float:
    """SA_PHASE_TIMING=1 diagnostic: force completion of `arr` (fetch one
    element — the only true sync on remote-attached TPUs, ~0.3 s RTT) and
    log the elapsed phase time. Costs ~1 s total per generate; OFF by
    default because the syncs serialize phases the scheduler could overlap."""
    jax.device_get(arr[(0,) * arr.ndim])
    t = time.time()
    print(f"[phase] {name}: {t - t0:.2f}s", file=sys.stderr, flush=True)
    return t


def _generate_segmented(models, params, ref_image, pose_pixels, face_embedding,
                        cfg: PipelineConfig, rng, spd: int, mesh=None,
                        clip_image=None, progress=None, face_opt=None):
    """generate() in bounded device executions: one prep program, then the
    Euler loop in host-dispatched segments of `spd` steps (one compiled
    segment program reused across segments — the step offset is traced),
    then one decode program.

    Same math as the single-program path (asserted in test_pipeline); the
    point is that no single device execution runs longer than ~spd steps.
    A long video's single-program denoise executes for minutes, which trips
    execution watchdogs on remote-attached TPUs (a 512^2 x 64f x 25-step
    single program reproducibly killed the worker; 12 steps survived) — and
    segments give the CLI/server real progress reporting for free.

    progress: optional callable(done_steps, total_steps), called after each
    segment dispatch (dispatches are async; this reports dispatch progress,
    not device completion).
    """
    from stableanimator_tpu.ops.gate import ACTIVE_MESH

    tok = ACTIVE_MESH.set(mesh) if mesh is not None else None
    timing = os.environ.get("SA_PHASE_TIMING", "0") == "1"
    t0 = time.time() if timing else 0.0
    try:
        latents, context, image_latents, add_time_ids, pose_latents = _prep_jit(
            models, params, ref_image, pose_pixels, face_embedding, cfg, rng,
            clip_image)
        if timing:
            t0 = _phase_mark("prep(+pose_net)", t0, latents)
        seg_fn = (_segment_jit if face_opt is None
                  else _make_face_opt_segment_jit(face_opt))
        n = cfg.num_inference_steps
        done = 0
        offset = jnp.zeros((), jnp.int32)
        while done < n:
            k = min(spd, n - done)
            latents, offset = seg_fn(
                models, params, latents, context, image_latents, add_time_ids,
                pose_latents, cfg, offset, k, mesh)
            done += k
            if progress is not None:
                progress(done, n)
        if timing:
            t0 = _phase_mark(f"denoise({n} steps)", t0, latents)
        out = _decode_dispatched(models, params, latents, cfg, mesh)
        if timing:
            _phase_mark("decode", t0, out)
        return out
    finally:
        if tok is not None:
            ACTIVE_MESH.reset(tok)


def resolve_steps_per_dispatch(cfg: PipelineConfig,
                               face_opt_active: bool = False) -> int | None:
    """PipelineConfig.steps_per_dispatch "auto" policy.

    Short videos (<= 4 tiles) keep the fastest single-program path (same
    cutover as diffusion/tiling.py::auto_tile_batch). Past that, the segment
    size scales INVERSELY with the per-step work so the device time of one
    segment execution stays roughly constant: each padded tile-slot costs
    ~0.37 s of UNet compute per step at 512^2, and executions beyond
    ~35-60 s trip remote-worker watchdogs (measured: a 5-step segment at
    450 frames = 190 slots ~ 57 s crashed the worker; 5-step segments at
    64 frames = 30 slots ~ 9 s ran fine). Budget ~30 tile-slots (~11 s)
    per segment: 64f -> 5 steps/dispatch, 450f -> 1.

    With the HJB face optimizer active each step additionally decodes +
    ArcFace-embeds every frame's face crop `steps` times, so the slot
    budget is halved to keep segment executions inside the same watchdog
    envelope."""
    spd = cfg.steps_per_dispatch
    if spd != "auto":
        return spd
    if cfg.num_frames <= cfg.tile_size:
        return None
    n_tiles = tile_indices(cfg.num_frames, cfg.tile_size,
                           cfg.tile_overlap).shape[0]
    if n_tiles <= 4:
        return None
    mtb = (auto_tile_batch(cfg.num_frames, cfg.tile_size, cfg.tile_overlap)
           if cfg.max_tile_batch == "auto" else cfg.max_tile_batch)
    slots_per_step = (-(-n_tiles // mtb) * mtb) if mtb else n_tiles
    budget = 15 if face_opt_active else 30
    return max(1, min(5, budget // slots_per_step))


def generate(models: AnimationModels, params, ref_image, pose_pixels,
             face_embedding, cfg: PipelineConfig | None = None, rng=None,
             face_opt=None, mesh=None, clip_image=None, progress=None):
    """Generate an animation.

    ref_image:      [1, H, W, 3] float32 in [0, 1] (generation resolution)
                    — or uint8 0-255; converted on device (1/4 transfer)
    clip_image:     optional original-resolution [1, H0, W0, 3] for the
                    CLIP branch (the reference's behaviour); fp32 or uint8
    pose_pixels:    [F, H, W, 3] float32 in [-1, 1] (pose renderings) —
                    or uint8 0-255, mapped to [-1, 1] on device
    face_embedding: [1, id_dim] ArcFace embedding of the reference face
    face_opt:       optional FaceOptimizer (HJB identity refinement)
    mesh:           optional Mesh for multi-chip (data x frame) inference;
                    put params on the mesh (parallel.shard_params) first
    progress:       optional callable(done_steps, total_steps); only called
                    when cfg.steps_per_dispatch routes to the segmented
                    long-video path (the default for > 4 tiles)
    returns frames  [F, H, W, 3] float32 in [0, 1] (uint8 0-255 when
                    cfg.output_uint8); long videos on a single chip come
                    back as a HOST ndarray (per-group fetch overlaps the
                    device decode), shorter ones as a device array
    """
    cfg = cfg or PipelineConfig()
    if rng is None:
        rng = jax.random.PRNGKey(23123134)  # reference seed_everything default
    cfg = dataclasses.replace(
        cfg,
        height=ref_image.shape[1], width=ref_image.shape[2],
        num_frames=pose_pixels.shape[0],
        tile_size=min(cfg.tile_size, pose_pixels.shape[0]),
    )
    spd = resolve_steps_per_dispatch(cfg, face_opt is not None)
    if spd is not None:
        return _generate_segmented(models, params, ref_image, pose_pixels,
                                   face_embedding, cfg, rng, spd,
                                   mesh=mesh, clip_image=clip_image,
                                   progress=progress, face_opt=face_opt)
    return _generate_jit(models, params, ref_image, pose_pixels,
                         face_embedding, cfg, rng, face_opt, mesh,
                         clip_image)


def _zeros_on_device(shape, dtype):
    """Device-side zeros via a tiny jitted fill: warm-up inputs must NOT
    stream through the host->device tunnel (a 450-frame uint8 pose dummy is
    354 MB = 5-50 s of transfer at measured tunnel bandwidth; the jitted
    fill is a one-off trivial compile + zero transfer)."""
    return jax.jit(lambda: jnp.zeros(shape, dtype))()


def warm_generate(models: AnimationModels, params, cfg: PipelineConfig,
                  *, rng=None, mesh=None, uint8_inputs=True, clip_shape=None,
                  execute: bool | str = "auto", face_opt=None):
    """Compile every program `generate()` will dispatch for `cfg`, before the
    real inputs exist — so host-side preprocessing (DWPose extraction,
    checkpoint IO) can overlap the multi-minute remote compile instead of
    running serially after it (at 450 frames pose extraction is ~59 s that
    hides entirely behind the ~180 s compile phase).

    Run this on a background thread while the caller prepares inputs; the
    later `generate()` call with the same cfg/shapes/dtypes is then
    compile-free. cfg must carry the real height/width/num_frames.

    execute:
      "auto" (default) — the segmented long-video programs are additionally
        dummy-EXECUTED once (prep + one segment per distinct step count +
        one decode per distinct group size): execution populates the jit
        signature cache, so the 25-segment dispatch loop later does zero
        re-tracing. Costs ~one segment of device time (~15 s at 450f).
        The flat short-video path is compile-only (AOT lower+compile; a
        dummy execution would run the whole video for nothing).
      False — compile-only everywhere (later call re-traces but hits the
        persistent compile cache).
      True — dummy-execute the segmented path (same as "auto" today).

    face_opt: optional FaceOptimizer — warm the face-opt programs instead
      (the heaviest configuration; it both halves the auto segment size and
      swaps in the HJB segment program). Build the optimizer with
      placeholder boxes (make_face_optimizer(pose_pixels=None,
      num_frames=F)) before pose extraction and swap the real boxes in
      later with .with_boxes(): boxes/target are traced pytree leaves, so
      the warmed cache entries still hit.

    Returns a dict of what was warmed (path, program count, executed).
    """
    cfg = dataclasses.replace(
        cfg, tile_size=min(cfg.tile_size, cfg.num_frames))
    if rng is None:
        rng = jax.random.PRNGKey(0)
    h, w, f = cfg.height, cfg.width, cfg.num_frames
    dt = jnp.uint8 if uint8_inputs else jnp.float32
    spd = resolve_steps_per_dispatch(cfg, face_opt is not None)
    if spd is None:
        # flat path: one program; AOT compile from shape structs (no
        # arrays, no transfer). The later real call re-traces but the
        # backend compile is a persistent-cache hit.
        ref = jax.ShapeDtypeStruct((1, h, w, 3), dt)
        pose = jax.ShapeDtypeStruct((f, h, w, 3), dt)
        emb = jax.ShapeDtypeStruct(
            (1, models.face_encoder.config.id_embeddings_dim),
            jnp.float32)
        clip = (None if clip_shape is None else
                jax.ShapeDtypeStruct((1, *clip_shape, 3), dt))
        _generate_jit.lower(models, params, ref, pose, emb, cfg, rng,
                            face_opt, mesh, clip).compile()
        return {"path": "flat", "programs": 1, "executed": False,
                "face_opt": face_opt is not None}

    do_exec = execute in ("auto", True)
    ref = _zeros_on_device((1, h, w, 3), dt)
    pose = _zeros_on_device((f, h, w, 3), dt)
    emb = _zeros_on_device(
        (1, models.face_encoder.config.id_embeddings_dim), jnp.float32)
    clip = (None if clip_shape is None else
            _zeros_on_device((1, *clip_shape, 3), dt))
    from stableanimator_tpu.ops.gate import ACTIVE_MESH

    mtok = ACTIVE_MESH.set(mesh) if mesh is not None else None
    programs = 0
    try:
        if do_exec:
            state = _prep_jit(models, params, ref, pose, emb, cfg, rng,
                              clip)
            latents, context, image_latents, add_time_ids, pose_lat = state
        else:
            lowered = _prep_jit.lower(models, params, ref, pose, emb,
                                      cfg, rng, clip)
            lowered.compile()
            # compile-only: continue from the prep program's OUTPUT
            # ShapeDtypeStructs — lowering the downstream programs needs
            # only abstract values (fixes the documented execute=False
            # option on the segmented path)
            latents, context, image_latents, add_time_ids, pose_lat = (
                lowered.out_info)
        programs += 1

        def _warm_segment(latents, offset, k):
            if face_opt is not None:
                if do_exec:
                    return _segment_fo_jit(
                        models, params, latents, context, image_latents,
                        add_time_ids, pose_lat, face_opt, cfg, offset, k,
                        mesh)
                _segment_fo_jit.lower(
                    models, params, latents, context, image_latents,
                    add_time_ids, pose_lat, face_opt, cfg, offset, k,
                    mesh).compile()
            elif do_exec:
                return _segment_jit(
                    models, params, latents, context, image_latents,
                    add_time_ids, pose_lat, cfg, offset, k, mesh)
            else:
                _segment_jit.lower(
                    models, params, latents, context, image_latents,
                    add_time_ids, pose_lat, cfg, offset, k, mesh
                ).compile()
            return latents, offset

        # distinct segment lengths the dispatch loop will use
        n = cfg.num_inference_steps
        ks = {min(spd, n)}
        if n % spd:
            ks.add(n % spd)
        offset = jnp.zeros((), jnp.int32)
        for k in sorted(ks, reverse=True):
            latents, offset = _warm_segment(latents, offset, k)
            programs += 1

        # distinct decode programs (mirror _decode_dispatched)
        h8, w8 = h // 8, w // 8
        chunk = min(cfg.decode_chunk_size, f)
        per = chunk * max(1, cfg.batched_decode_max_latent_volume
                          // max(chunk * h8 * w8, 1))
        if mesh is not None or f <= per:
            if do_exec:
                out = _decode_jit(models, params, latents, cfg, mesh)
            else:
                _decode_jit.lower(models, params, latents, cfg,
                                  mesh).compile()
            programs += 1
        else:
            gs = {per}
            if f % per:
                gs.add(f % per)
            start = jnp.zeros((), jnp.int32)
            out = None
            for g in sorted(gs, reverse=True):
                if do_exec:
                    out, start = _decode_group_jit(models, params,
                                                   latents, start, cfg,
                                                   g, mesh)
                else:
                    _decode_group_jit.lower(models, params, latents,
                                            start, cfg, g, mesh).compile()
                programs += 1
        if do_exec:
            # one-element fetch = the only true sync on remote TPUs;
            # the caller's join() then means "the chip is idle again"
            jax.device_get(out[(0,) * out.ndim])
        return {"path": "segmented", "programs": programs,
                "executed": bool(do_exec),
                "face_opt": face_opt is not None}
    finally:
        if mtok is not None:
            ACTIVE_MESH.reset(mtok)
