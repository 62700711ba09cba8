"""Pose-conditioned SVD finetuning: loss + data-parallel train step.

The reference's train.py is absent from its snapshot; this implements the
training contract specified by command_train.sh:1-21 + README.md:285-363
(see SURVEY.md §3.5): 16-frame clips, EDM noising, face-masked
reconstruction loss, trainable {unet, pose_net, face_encoder} over frozen
{vae, clip}, lr 1e-5 with 500-step warmup, grad clipping, grad
accumulation, mixed precision.

TPU-native execution model:
  * one jitted step; the batch axis is sharded over the mesh "data" axis
    and gradients reduce via the psum that pjit inserts (the reference
    relies on accelerate/NCCL DDP),
  * EDM math in fp32; model compute bf16,
  * gradient accumulation via optax.MultiSteps inside the jitted step,
  * optional rematerialisation comes from jax.checkpoint applied at the
    UNet-block boundary (gradient_checkpointing flag).

Loss formulation (EDM, sigma_data = 1):
  sigma ~ exp(N(p_mean, p_std)); x_t = x0 + sigma eps
  x0_hat = c_skip x_t + c_out F(c_in x_t, c_noise)
  L = lambda(sigma) * w_face(px) * ||x0_hat - x0||^2,
      lambda = (1+sigma^2)/sigma^2
  w_face = 1 + face_loss_weight * mask  (mask from face_mask_extraction,
  downsampled to latent resolution; README.md:259).

Conditioning dropout (conditioning_dropout_prob) zeroes the CLIP/face
context, the reference-image latent, and the pose latents per-sample so
classifier-free guidance is usable at inference — the reference's released
checkpoints behave this way (its uncond pass zeroes the same three inputs:
inference_pipeline_animation.py:536-540,563,663-671).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from stableanimator_tpu.core.config import PipelineConfig, SchedulerConfig, TrainConfig
from stableanimator_tpu.diffusion.scheduler import (
    edm_loss_weight,
    sample_sigmas_lognormal,
    timestep_of_sigma,
)
from stableanimator_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD
from stableanimator_tpu.ops.resize import resize_antialias
from stableanimator_tpu.pipeline.animation import AnimationModels


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any          # trainable: {"unet", "pose_net", "face_encoder"}
    frozen: Any          # frozen:    {"vae", "clip"}
    opt_state: Any


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.join_schedules(
        [optax.linear_schedule(0.0, cfg.learning_rate, cfg.lr_warmup_steps),
         optax.constant_schedule(cfg.learning_rate)],
        [cfg.lr_warmup_steps],
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(schedule, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                    eps=cfg.adam_epsilon, weight_decay=cfg.adam_weight_decay),
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


DEFAULT_TRAINABLE = ("unet", "pose_net", "face_encoder")


def create_train_state(params: dict, cfg: TrainConfig,
                       trainable_keys=DEFAULT_TRAINABLE,
                       ) -> tuple[TrainState, optax.GradientTransformation]:
    """trainable_keys selects what the optimizer updates — the reference
    trains {unet, pose_net, face_encoder} (README.md:92-94); adapter-only
    finetunes ({pose_net, face_encoder}) fit a single 16 GB chip since the
    1.5B-param UNet then carries no Adam state."""
    trainable = {k: params[k] for k in trainable_keys}
    frozen = {k: v for k, v in params.items() if k not in trainable_keys}
    tx = make_optimizer(cfg)
    opt_state = tx.init(trainable)
    return TrainState(jnp.zeros((), jnp.int32), trainable, frozen, opt_state), tx


def _encode_context(models: AnimationModels, p, ref_image, face_embedding):
    """CLIP + face tokens for the conditioned stream."""
    ccfg = models.clip.config
    x = ref_image * 2.0 - 1.0
    x = resize_antialias(x, ccfg.image_size, ccfg.image_size)
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_IMAGE_MEAN, x.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, x.dtype)
    clip_embed = models.clip.apply({"params": p["clip"]}, (x - mean) / std)
    clip_embed = clip_embed[:, None, :].astype(jnp.float32)
    faceid = models.face_encoder.apply(
        {"params": p["face_encoder"]},
        face_embedding.astype(clip_embed.dtype), clip_embed).astype(jnp.float32)
    return jnp.concatenate([clip_embed, faceid], axis=1)


def train_loss(models: AnimationModels, trainable, frozen, batch, rng,
               cfg: TrainConfig, pipe: PipelineConfig,
               sched: SchedulerConfig | None = None,
               conditioning_dropout_prob: float = 0.1,
               encode_chunk: int = 4):
    """EDM face-masked reconstruction loss.

    batch dict (all float32, channels-last):
      frames      [B, F, H, W, 3] in [-1, 1]   target clip
      ref_image   [B, H, W, 3]    in [0, 1]    reference frame
      pose_pixels [B, F, H, W, 3] in [-1, 1]   skeleton renderings
      face_embed  [B, id_dim]                  ArcFace embedding
      face_mask   [B, F, H, W, 1] in {0, 1}    facial-region mask
    encode_chunk bounds the fp32 VAE-encode activation footprint (the
    encoder is per-frame, so chunking is exact; 16 frames at 512^2 in one
    batch would need several GB of level-0 fp32 activations).
    """
    sched = sched or SchedulerConfig()
    p = {**frozen, **trainable}
    b, f, hh, ww, _ = batch["frames"].shape
    h8, w8 = hh // 8, ww // 8
    scaling = models.vae.config.scaling_factor
    rngs = jax.random.split(rng, 5)

    # --- targets: per-frame VAE encode (frozen, fp32), SVD latent scaling
    frames_flat = batch["frames"].reshape(b * f, hh, ww, 3)
    chunk = encode_chunk if (b * f) % encode_chunk == 0 else b * f

    def encode_moments(imgs):
        m = models.vae.apply({"params": p["vae"]}, imgs,
                             method=models.vae.encode)
        return m.mean, m.logvar

    mean, logvar = jax.lax.map(
        encode_moments, frames_flat.reshape(-1, chunk, hh, ww, 3))
    mean = mean.reshape(b * f, h8, w8, -1).astype(jnp.float32)
    logvar = logvar.reshape(b * f, h8, w8, -1).astype(jnp.float32)
    eps0 = jax.random.normal(rngs[0], mean.shape, jnp.float32)
    x0 = (mean + jnp.exp(0.5 * logvar) * eps0) * scaling
    x0 = x0.reshape(b, f, h8, w8, -1)

    # --- conditioning
    context = _encode_context(models, p, batch["ref_image"],
                              batch["face_embed"])
    ref_in = batch["ref_image"] * 2.0 - 1.0
    ref_in = ref_in + pipe.noise_aug_strength * jax.random.normal(
        rngs[1], ref_in.shape, jnp.float32)
    ref_moments = models.vae.apply({"params": p["vae"]}, ref_in,
                                   method=models.vae.encode)
    # conditioning latent is NOT scaled by scaling_factor (reference
    # _encode_vae_image: inference_pipeline_animation.py:246-272)
    ref_lat = ref_moments.mode().astype(jnp.float32)

    pose_latents = models.pose_net.apply(
        {"params": p["pose_net"]},
        batch["pose_pixels"].reshape(b * f, hh, ww, 3)).astype(jnp.float32)

    # --- conditioning dropout for CFG
    if conditioning_dropout_prob > 0:
        keep = jax.random.bernoulli(
            rngs[2], 1.0 - conditioning_dropout_prob, (b,)).astype(jnp.float32)
        context = context * keep[:, None, None]
        ref_lat = ref_lat * keep[:, None, None, None]
        keep_f = jnp.repeat(keep, f, axis=0)
        pose_latents = pose_latents * keep_f[:, None, None, None]

    # --- EDM noising (fp32)
    sigmas = sample_sigmas_lognormal(rngs[3], (b,), sched)
    noise = jax.random.normal(rngs[4], x0.shape, jnp.float32)
    sig5 = sigmas[:, None, None, None, None]
    x_t = x0 + sig5 * noise
    model_in = x_t / jnp.sqrt(sig5**2 + 1.0)
    ref_bcast = jnp.broadcast_to(ref_lat[:, None], x0.shape[:-1] + (ref_lat.shape[-1],))
    model_in = jnp.concatenate([model_in, ref_bcast], axis=-1)
    t = timestep_of_sigma(sigmas)

    add_ids = jnp.broadcast_to(
        jnp.asarray([[pipe.fps - 1, pipe.motion_bucket_id,
                      pipe.noise_aug_strength]], jnp.float32), (b, 3))

    v = models.unet.apply({"params": p["unet"]}, model_in, t, context,
                          add_ids, pose_latents).astype(jnp.float32)

    # x0_hat from v-prediction, loss on x0 with EDM weighting
    x0_hat = v * (-sig5 / jnp.sqrt(sig5**2 + 1.0)) + x_t / (sig5**2 + 1.0)
    lam = edm_loss_weight(sigmas)[:, None, None, None, None]

    # face-region weighting at latent resolution
    mask = batch["face_mask"].reshape(b * f, hh, ww, 1)
    mask = jax.image.resize(mask, (b * f, h8, w8, 1), method="nearest")
    mask = mask.reshape(b, f, h8, w8, 1)
    w_face = 1.0 + cfg.face_loss_weight * mask

    loss = jnp.mean(lam * w_face * jnp.square(x0_hat - x0))
    return loss


def make_train_step(models: AnimationModels, tx, cfg: TrainConfig,
                    pipe: PipelineConfig,
                    conditioning_dropout_prob: float = 0.1,
                    donate: bool = True, mesh=None):
    """Build the jitted data-parallel train step.

    Shard `batch` leaves over the mesh "data" axis and keep params
    replicated; pjit inserts the gradient all-reduce.

    mesh: pass the training Mesh when the step will run GSPMD-partitioned.
    Trace-level kernel gates consult it (ops/gate.ACTIVE_MESH): the Pallas
    flash attention must be shard_map-wrapped inside a partitioned program
    (GSPMD cannot partition Mosaic custom calls — surfaced by the real
    v5e:2x4 topology AOT, tools/aot_v5e8.py). Without it, a multi-device
    compile of this step fails.
    """

    def step_fn(state: TrainState, batch, rng):
        from stableanimator_tpu.ops.gate import ACTIVE_MESH

        tok = ACTIVE_MESH.set(mesh) if mesh is not None else None
        try:
            rng2 = jax.random.fold_in(rng, state.step)

            def loss_fn(trainable):
                return train_loss(
                    models, trainable, state.frozen, batch, rng2, cfg, pipe,
                    conditioning_dropout_prob=conditioning_dropout_prob)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = {
                "loss": loss,
                "grad_norm": optax.global_norm(grads),
            }
            return (TrainState(state.step + 1, params, state.frozen,
                               opt_state), metrics)
        finally:
            if tok is not None:
                ACTIVE_MESH.reset(tok)

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
