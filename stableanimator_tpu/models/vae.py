"""KL VAE with plain-2D encoder and temporal decoder (SVD's
AutoencoderKLTemporalDecoder). Re-expresses reference
animation/modules/vae.py:217-965.

  * Encoder: conv_in -> 4 x DownEncoderBlock2D (2 resnets, asymmetric-pad
    downsample) -> mid (resnet/attn/resnet) -> norm/act/conv_out -> 8ch
    moments -> quant_conv (vae.py:482-554).
  * TemporalDecoder: conv_in -> mid (2 SpatioTemporalResBlocks around a
    single-head attention) -> 4 x UpBlockTemporalDecoder (3
    SpatioTemporalResBlocks + upsample) -> norm/act/conv_out -> Conv3d
    (3,1,1) time_conv_out across frames (vae.py:387-478).  The decoder's
    AlphaBlenders run in reverse mode (alpha = 1 - sigmoid(mix); vae.py:960-
    962) and its SpatioTemporalResBlocks carry no time embedding.

Encode always runs in float32 (the reference force-upcasts:
inference_pipeline_animation.py:547-561); decode runs in the configured
compute dtype.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from stableanimator_tpu.core.config import VAEConfig
from stableanimator_tpu.models.layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    SpatioTemporalResBlock,
    Upsample2D,
)
from stableanimator_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype


class VAEAttention(nn.Module):
    """Single-head full attention over spatial tokens with GroupNorm input
    and internal residual (reference vae.py:31-110). q/k/v carry biases."""

    channels: int
    heads: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        n, hh, ww, c = x.shape
        residual = x
        tokens = x.reshape(n, hh * ww, c)
        tokens = GroupNorm(num_groups=32, eps=1e-6, name="group_norm")(tokens)
        q = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="to_q")(tokens)
        k = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="to_k")(tokens)
        v = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="to_v")(tokens)
        d = c // self.heads
        q = q.reshape(n, -1, self.heads, d)
        k = k.reshape(n, -1, self.heads, d)
        v = v.reshape(n, -1, self.heads, d)
        # dispatch like every other attention: Pallas flash on TPU for the
        # 4096-token 512^2-decode mid block (the naive formulation
        # materialises a ~268 MB fp32 logits tensor PER FRAME in HBM),
        # fp32-softmax XLA elsewhere — identical math either way
        o = dot_product_attention(q, k, v).reshape(n, hh * ww, c)
        o = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="to_out")(o)
        return o.reshape(n, hh, ww, c) + residual


class Encoder(nn.Module):
    """Plain-2D KL encoder producing 2*latent_channels moments
    (reference vae.py:482-554)."""

    config: VAEConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(ch, eps=1e-6, use_temb=False, dtype=self.dtype,
                                  name=f"down_blocks_{i}_resnets_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                x = Downsample2D(ch, asymmetric_padding=True, dtype=self.dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(x)
        mid_ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(mid_ch, eps=1e-6, use_temb=False, dtype=self.dtype,
                          name="mid_block_resnets_0")(x)
        x = VAEAttention(mid_ch, dtype=self.dtype, name="mid_block_attentions_0")(x)
        x = ResnetBlock2D(mid_ch, eps=1e-6, use_temb=False, dtype=self.dtype,
                          name="mid_block_resnets_1")(x)
        x = GroupNorm(num_groups=32, eps=1e-6, name="conv_norm_out")(x)
        x = jax.nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(x)
        return x


class TemporalDecoder(nn.Module):
    """Temporal decoder (reference vae.py:387-478). Input latent tokens
    [N, h, w, latent]; N = batch * num_frames."""

    config: VAEConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, *, num_frames: int):
        cfg = self.config
        mid_ch = cfg.block_out_channels[-1]

        def st_block(ch, name):
            return SpatioTemporalResBlock(
                ch, num_frames, eps=1e-6, temporal_eps=1e-5, merge_factor=0.0,
                use_temb=False, reverse_time_mix=True, dtype=self.dtype, name=name)

        x = nn.Conv(mid_ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(z)

        # mid: resnets[0] -> attn -> resnets[1] (reference vae.py:594-612)
        x = st_block(mid_ch, "mid_block_resnets_0")(x)
        x = VAEAttention(mid_ch, dtype=self.dtype, name="mid_block_attentions_0")(x)
        x = st_block(mid_ch, "mid_block_resnets_1")(x)

        rev = list(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = st_block(ch, f"up_blocks_{i}_resnets_{j}")(x)
            if i < len(rev) - 1:
                x = Upsample2D(ch, dtype=self.dtype,
                               name=f"up_blocks_{i}_upsamplers_0")(x)

        x = GroupNorm(num_groups=32, eps=1e-6, name="conv_norm_out")(x)
        x = jax.nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(x)

        # Conv3d (3,1,1) across frames (reference vae.py:431-438, 467-475)
        n, hh, ww, c = x.shape
        b = n // num_frames
        xv = x.reshape(b, num_frames, hh, ww, c)
        xv = nn.Conv(cfg.out_channels, (3, 1, 1),
                     padding=((1, 1), (0, 0), (0, 0)), dtype=self.dtype,
                     param_dtype=jnp.float32, name="time_conv_out")(xv)
        return xv.reshape(n, hh, ww, c)


class GaussianMoments(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    def mode(self):
        return self.mean

    def sample(self, rng):
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def kl(self):
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + jnp.exp(self.logvar) - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


class AutoencoderKLTemporalDecoder(nn.Module):
    """encode(x) -> GaussianMoments; decode(z, num_frames) -> frames
    (reference vae.py:217-305)."""

    config: VAEConfig
    dtype: Optional[Dtype] = None

    def setup(self):
        # encode is an fp32 island (force_upcast; reference pipeline:547-561)
        self.encoder = Encoder(self.config, dtype=jnp.float32)
        self.decoder = TemporalDecoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=jnp.float32, param_dtype=jnp.float32,
                                  name="quant_conv")

    def encode(self, x) -> GaussianMoments:
        moments = self.quant_conv(self.encoder(x.astype(jnp.float32)))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return GaussianMoments(mean, jnp.clip(logvar, -30.0, 20.0))

    def decode(self, z, *, num_frames: int):
        return self.decoder(z, num_frames=num_frames)

    def __call__(self, x, *, num_frames: int, rng=None):
        moments = self.encode(x)
        z = moments.mode() if rng is None else moments.sample(rng)
        return self.decode(z.astype(x.dtype), num_frames=num_frames)
