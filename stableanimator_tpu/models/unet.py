"""The SVD-XT spatio-temporal video UNet with StableAnimator conditioning.

Re-expresses (not ports) reference animation/modules/unet.py:34-362 and its
block zoo (:1085-1456). Differences from the reference are layout/execution
only, never math:

  * channels-last video layout [B, F, H, W, C]; frames fold into the batch
    for all spatial ops (reference folds at unet.py:273-280),
  * one Flax module tree instead of runtime attention-processor surgery:
    the ID adapter (id_to_k/id_to_v + renormalisation) is a real submodule
    of every spatial cross-attention (reference patches processors at
    inference_basic.py:348-445),
  * classifier-free guidance batches cond+uncond in a single forward: the
    uncond stream simply receives zero context and zero pose latents, which
    is numerically identical to the reference's two sequential calls with
    zeros/None (reference inference_pipeline_animation.py:663-685).

Config (UNetConfig defaults): 4 levels, block_out (320,640,1280,1280),
heads (5,10,20,20) with dim_head 64 everywhere, cross_attention_dim 1024,
in 8ch (4 noise + 4 reference latent), out 4ch.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from stableanimator_tpu.core.config import UNetConfig
from stableanimator_tpu.models.layers import (
    Downsample2D,
    GroupNorm,
    SpatioTemporalResBlock,
    TimestepEmbedding,
    Upsample2D,
    sinusoidal_embedding,
)
from stableanimator_tpu.models.transformer import TransformerSpatioTemporalModel

Dtype = jnp.dtype


def _maybe_remat(cls, remat: bool, static_argnums=()):
    """Gradient checkpointing at sub-block granularity: rematerialising a
    whole multi-layer UNet block holds all of its GEGLU intermediates live
    at once during the backward recompute (~2 GB at the 64^2 level), so
    each resnet / transformer is checkpointed individually."""
    return (nn.remat(cls, prevent_cse=False, static_argnums=static_argnums)
            if remat else cls)


class CrossAttnDownBlock(nn.Module):
    """2 x (SpatioTemporalResBlock -> TransformerSpatioTemporalModel) +
    strided-conv downsample (reference unet.py:1214-1305, resnet eps 1e-6)."""

    out_channels: int
    heads: int
    num_frames: int
    num_layers: int = 2
    transformer_layers: int = 1
    num_id_tokens: int = 4
    add_downsample: bool = True
    use_flash: Optional[bool] = None
    quant: bool = False
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, temb, context):
        num_frames = self.num_frames
        res_cls = _maybe_remat(SpatioTemporalResBlock, self.remat)
        attn_cls = _maybe_remat(TransformerSpatioTemporalModel, self.remat)
        states = []
        for i in range(self.num_layers):
            x = res_cls(
                self.out_channels, num_frames, eps=1e-6, merge_factor=0.5,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            x = attn_cls(
                self.heads, self.out_channels // self.heads, num_frames,
                num_layers=self.transformer_layers,
                num_id_tokens=self.num_id_tokens, use_flash=self.use_flash,
                quant=self.quant, remat=self.remat, dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, context)
            states.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            states.append(x)
        return x, states


class DownBlock(nn.Module):
    """2 x SpatioTemporalResBlock, no attention, no downsample at the final
    level (reference unet.py:1169-1211, resnet eps 1e-5)."""

    out_channels: int
    num_frames: int
    num_layers: int = 2
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, temb):
        num_frames = self.num_frames
        res_cls = _maybe_remat(SpatioTemporalResBlock, self.remat)
        states = []
        for i in range(self.num_layers):
            x = res_cls(
                self.out_channels, num_frames, eps=1e-5, merge_factor=0.5,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            states.append(x)
        return x, states


class MidBlock(nn.Module):
    """resnet -> transformer -> resnet (reference unet.py:1085-1166,
    eps 1e-5)."""

    channels: int
    heads: int
    num_frames: int
    transformer_layers: int = 1
    num_id_tokens: int = 4
    use_flash: Optional[bool] = None
    quant: bool = False
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, temb, context):
        num_frames = self.num_frames
        res_cls = _maybe_remat(SpatioTemporalResBlock, self.remat)
        attn_cls = _maybe_remat(TransformerSpatioTemporalModel, self.remat)
        x = res_cls(self.channels, num_frames, eps=1e-5, merge_factor=0.5,
                    dtype=self.dtype, name="resnets_0")(x, temb)
        x = attn_cls(
            self.heads, self.channels // self.heads, num_frames,
            num_layers=self.transformer_layers, num_id_tokens=self.num_id_tokens,
            use_flash=self.use_flash, quant=self.quant, remat=self.remat,
            dtype=self.dtype, name="attentions_0",
        )(x, context)
        x = res_cls(self.channels, num_frames, eps=1e-5, merge_factor=0.5,
                    dtype=self.dtype, name="resnets_1")(x, temb)
        return x


class UpBlock(nn.Module):
    """3 x SpatioTemporalResBlock over skip-concatenated inputs + upsample
    (reference unet.py:1308-1358, resnet eps 1e-6 — get_up_block does not
    override the block's default)."""

    out_channels: int
    num_frames: int
    num_layers: int = 3
    add_upsample: bool = True
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, skips, temb):
        num_frames = self.num_frames
        res_cls = _maybe_remat(SpatioTemporalResBlock, self.remat)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips[self.num_layers - 1 - i]], axis=-1)
            x = res_cls(
                self.out_channels, num_frames, eps=1e-6, merge_factor=0.5,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class CrossAttnUpBlock(nn.Module):
    """3 x (SpatioTemporalResBlock -> Transformer) over skips + upsample
    (reference unet.py:1361-1456, resnet eps 1e-6)."""

    out_channels: int
    heads: int
    num_frames: int
    num_layers: int = 3
    transformer_layers: int = 1
    num_id_tokens: int = 4
    add_upsample: bool = True
    use_flash: Optional[bool] = None
    quant: bool = False
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, skips, temb, context):
        num_frames = self.num_frames
        res_cls = _maybe_remat(SpatioTemporalResBlock, self.remat)
        attn_cls = _maybe_remat(TransformerSpatioTemporalModel, self.remat)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips[self.num_layers - 1 - i]], axis=-1)
            x = res_cls(
                self.out_channels, num_frames, eps=1e-6, merge_factor=0.5,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            x = attn_cls(
                self.heads, self.out_channels // self.heads, num_frames,
                num_layers=self.transformer_layers,
                num_id_tokens=self.num_id_tokens, use_flash=self.use_flash,
                quant=self.quant, remat=self.remat, dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class UNetSpatioTemporal(nn.Module):
    """Full video UNet (reference unet.py:34-362).

    __call__(sample, timestep, context, added_time_ids, pose_latents)
      sample:         [B, F, H/8, W/8, in_channels]  (noise ++ ref latent)
      timestep:       scalar or [B] continuous timestep (0.25*ln sigma)
      context:        [B, 1 + num_id_tokens, cross_attention_dim]
      added_time_ids: [B, 3]  (fps-1, motion_bucket, noise_aug)
      pose_latents:   [B*F, H/8, W/8, block_out[0]] or None
    returns           [B, F, H/8, W/8, out_channels]
    """

    config: UNetConfig
    use_flash: Optional[bool] = None
    # int8-MXU execution of the transformer FF/projection matmuls
    # (ops/quant.py); opt-in, bf16-checkpoint-compatible
    quant: bool = False
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, sample, timestep, context, added_time_ids,
                 pose_latents=None):
        cfg = self.config


        b, f, hh, ww, _ = sample.shape

        # 1. time + added-conditioning embeddings (fp32 islands; reference
        #    unet.py:248-271)
        timesteps = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32).reshape(-1), (b,))
        t_emb = sinusoidal_embedding(timesteps, cfg.block_out_channels[0])
        t_emb = t_emb.astype(sample.dtype)
        emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                name="time_embedding")(t_emb)
        add_embeds = sinusoidal_embedding(
            added_time_ids.reshape(-1).astype(jnp.float32), cfg.addition_time_embed_dim
        ).reshape(b, -1).astype(emb.dtype)
        emb = emb + TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                      name="add_embedding")(add_embeds)

        # 2. fold frames into batch (reference unet.py:273-280)
        x = sample.reshape(b * f, hh, ww, sample.shape[-1])
        emb = jnp.repeat(emb, f, axis=0)
        context = jnp.repeat(context, f, axis=0)

        # Under a mesh, pin the folded batch to shard over BOTH axes:
        # GSPMD drops the frame-axis part of the [B, F, ...] input sharding
        # at the merge, leaving every spatial activation only data-sharded
        # (2x the expected activation memory without this constraint).
        # Note: even WITH it, the real-topology compile of the batch-4
        # (data=4, frame=2) full-unet train step needs 17.00 GB > 15.75
        # available (r5 tools/aot_v5e8.py train_full_sp: compiler
        # RESOURCE_EXHAUSTED, recorded in ESTIMATE_V5E8_AOT.json); the
        # configuration that fits v5e-8 is global batch 2 on (data=2,
        # frame=4) with 2-step grad accumulation (train_full_sp_b2).
        from stableanimator_tpu.ops.gate import active_mesh

        mesh = active_mesh()
        if mesh is not None and x.shape[0] % mesh.size == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(tuple(mesh.axis_names), None, None,
                                         None)))

        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv_in")(x)
        if pose_latents is not None:
            x = x + pose_latents.astype(x.dtype)

        skips = [x]

        # 3. down path
        for i, block_type in enumerate(cfg.down_block_types):
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                x, states = CrossAttnDownBlock(
                    cfg.block_out_channels[i], cfg.num_attention_heads[i], f,
                    num_layers=cfg.layers_per_block,
                    transformer_layers=cfg.transformer_layers_per_block,
                    num_id_tokens=cfg.num_id_tokens,
                    add_downsample=i < len(cfg.block_out_channels) - 1,
                    use_flash=self.use_flash, quant=self.quant,
                    remat=self.remat,
                    dtype=self.dtype, name=f"down_blocks_{i}",
                )(x, emb, context)
            elif block_type == "DownBlockSpatioTemporal":
                x, states = DownBlock(
                    cfg.block_out_channels[i], f,
                    num_layers=cfg.layers_per_block, remat=self.remat,
                    dtype=self.dtype, name=f"down_blocks_{i}",
                )(x, emb)
            else:
                raise ValueError(block_type)
            skips.extend(states)

        # 4. mid
        x = MidBlock(
            cfg.block_out_channels[-1], cfg.num_attention_heads[-1], f,
            transformer_layers=cfg.transformer_layers_per_block,
            num_id_tokens=cfg.num_id_tokens, use_flash=self.use_flash,
            quant=self.quant, remat=self.remat, dtype=self.dtype,
            name="mid_block")(
            x, emb, context)

        # 5. up path (reversed channel order; reference unet.py:133-168)
        rev_channels = list(reversed(cfg.block_out_channels))
        rev_heads = list(reversed(cfg.num_attention_heads))
        n_up = cfg.layers_per_block + 1
        for i, block_type in enumerate(cfg.up_block_types):
            add_up = i < len(cfg.block_out_channels) - 1
            block_skips = tuple(skips[-n_up:])
            del skips[-n_up:]
            if block_type == "UpBlockSpatioTemporal":
                x = UpBlock(
                    rev_channels[i], f, num_layers=n_up,
                    add_upsample=add_up, remat=self.remat, dtype=self.dtype,
                    name=f"up_blocks_{i}")(x, block_skips, emb)
            elif block_type == "CrossAttnUpBlockSpatioTemporal":
                x = CrossAttnUpBlock(
                    rev_channels[i], rev_heads[i], f, num_layers=n_up,
                    transformer_layers=cfg.transformer_layers_per_block,
                    num_id_tokens=cfg.num_id_tokens, add_upsample=add_up,
                    use_flash=self.use_flash, quant=self.quant,
                    remat=self.remat,
                    dtype=self.dtype, name=f"up_blocks_{i}")(
                    x, block_skips, emb, context)
            else:
                raise ValueError(block_type)

        # 6. head (reference unet.py:355-362; GroupNorm eps 1e-5)
        x = GroupNorm(num_groups=32, eps=1e-5, name="conv_norm_out")(x)
        x = jax.nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(x)
        return x.reshape(b, f, hh, ww, cfg.out_channels)
