"""Shared Flax building blocks for the video UNet and temporal VAE.

Channels-last layout throughout:
  * spatial tensors:  [N, H, W, C]  (N = batch * frames, frames folded)
  * video tensors:    [B, F, H, W, C]

Re-expresses (not ports) the reference blocks:
  ResnetBlock2D            reference animation/modules/unet.py:1610-1686
  TemporalResnetBlock      reference unet.py:1689-1769 / vae.py:835-897
  AlphaBlender             reference unet.py:439-476   / vae.py:951-965
  SpatioTemporalResBlock   reference unet.py:1546-1608 / vae.py:901-948
  Timesteps embedding      reference unet.py:365-403
  TimestepEmbedding        reference unet.py:406-436
  FeedForward / GEGLU      reference unet.py:827-870
  Downsample2D/Upsample2D  reference unet.py:1459-1483,1771-1809 / vae.py:718-781

All parameters are stored float32; `dtype` selects the compute precision
(bf16 on TPU). Norm statistics are always fp32 (ops/norms.py).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from stableanimator_tpu.ops.norms import group_norm, layer_norm
from stableanimator_tpu.ops.quant import int8_dense, int8_geglu
from stableanimator_tpu.ops.resize import upsample_nearest_2x

Dtype = jnp.dtype


class QuantDense(nn.Module):
    """Dense layer executed through the int8 MXU path (ops/quant.py).

    Parameter tree (kernel [in, out] fp32, bias [out] fp32) is identical to
    nn.Dense, so bf16 and int8 execution share checkpoints; only the
    forward math differs (W8A8 dynamic quantization, int32 accumulate)."""

    features: int
    use_bias: bool = True
    # GEGLU epilogue: features = 2N holds [W_value | W_gate]; the call
    # returns (xWv+bv) * gelu(xWg+bg) of shape [..., N]
    geglu: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.geglu:
            return int8_geglu(x, kernel, bias)
        return int8_dense(x, kernel, bias)


def make_dense(features, *, use_bias=True, dtype=None, name=None,
               quant=False):
    """nn.Dense or its int8-MXU twin, selected by `quant` — param trees are
    identical either way."""
    if quant:
        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, name=name)


def sinusoidal_embedding(timesteps, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embedding, [cos | sin] order, always float32
    (reference unet.py:365-390: sin/cos computed then flipped to cos/sin)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics over channels-last input."""

    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm(x, scale, bias, num_groups=self.num_groups, eps=self.eps)


class LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm(x, scale, bias, eps=self.eps)


class TimestepEmbedding(nn.Module):
    """linear -> SiLU -> linear (reference unet.py:406-436)."""

    embed_dim: int
    out_dim: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear_1")(x)
        x = jax.nn.silu(x)
        out = self.out_dim if self.out_dim is not None else self.embed_dim
        x = nn.Dense(out, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear_2")(x)
        return x


class AlphaBlender(nn.Module):
    """Learned sigmoid blend of spatial and temporal streams.

    reverse=False: out = a*spatial + (1-a)*temporal, a = sigmoid(mix_factor)
      (UNet blocks: reference unet.py:439-476; image_only_indicator is always
      zeros in this model, so the indicator branch reduces to the sigmoid.)
    reverse=True:  a = 1 - sigmoid(mix_factor)  (the VAE temporal decoder's
      switch_spatial_to_temporal_mix behaviour: reference vae.py:951-965).
    """

    alpha_init: float = 0.5
    reverse: bool = False

    @nn.compact
    def __call__(self, x_spatial, x_temporal):
        mix = self.param(
            "mix_factor",
            lambda key, shape: jnp.full(shape, self.alpha_init, dtype=jnp.float32),
            (1,),
        )
        alpha = jax.nn.sigmoid(mix.astype(jnp.float32))
        if self.reverse:
            alpha = 1.0 - alpha
        alpha = alpha.astype(x_spatial.dtype)
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class AlphaScalar(nn.Module):
    """The AlphaBlender's sigmoid mix scalar by itself (same parameter name
    and path, so checkpoints are interchangeable); callers apply the blend
    where the layout suits them."""

    alpha_init: float = 0.5
    reverse: bool = False

    @nn.compact
    def __call__(self):
        mix = self.param(
            "mix_factor",
            lambda key, shape: jnp.full(shape, self.alpha_init, dtype=jnp.float32),
            (1,),
        )
        alpha = jax.nn.sigmoid(mix.astype(jnp.float32))
        return (1.0 - alpha) if self.reverse else alpha


class ResnetBlock2D(nn.Module):
    """GroupNorm/SiLU/conv x2 with optional time-embedding add and 1x1
    shortcut on channel change (reference unet.py:1610-1686, vae.py:784-831).
    Input [N, H, W, C]."""

    out_channels: int
    eps: float = 1e-6
    use_temb: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, temb=None):
        h = GroupNorm(num_groups=32, eps=self.eps, name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        if self.use_temb and temb is not None:
            temb = jax.nn.silu(temb)
            temb = nn.Dense(self.out_channels, dtype=self.dtype,
                            param_dtype=jnp.float32, name="time_emb_proj")(temb)
            h = h + temb[:, None, None, :]
        h = GroupNorm(num_groups=32, eps=self.eps, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_shortcut")(x)
        return x + h


class TemporalResnetBlock(nn.Module):
    """Resnet over the frame axis: Conv3d kernel (3,1,1) on [B, F, H, W, C]
    (reference unet.py:1689-1769, vae.py:835-897)."""

    out_channels: int
    eps: float = 1e-6
    use_temb: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, temb=None):
        b, f, hh, ww, c = x.shape

        def norm(name):
            return GroupNorm(num_groups=32, eps=self.eps, name=name)

        h = norm("norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(h)
        if self.use_temb and temb is not None:
            # temb: [B, F, E] (reference unet.py:1753-1757)
            temb = jax.nn.silu(temb)
            temb = nn.Dense(self.out_channels, dtype=self.dtype,
                            param_dtype=jnp.float32, name="time_emb_proj")(temb)
            h = h + temb[:, :, None, None, :]
        h = norm("norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(h)
        if c != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_shortcut")(x)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    """Spatial resnet -> temporal resnet -> AlphaBlender
    (reference unet.py:1546-1608 with temb; vae.py:901-948 without).

    Input [N, H, W, C] with N = B * num_frames; temb [N, E] or None.
    """

    out_channels: int
    num_frames: int
    eps: float = 1e-6
    temporal_eps: Optional[float] = None
    merge_factor: float = 0.5
    use_temb: bool = True
    reverse_time_mix: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, temb=None):
        num_frames = self.num_frames
        h = ResnetBlock2D(self.out_channels, eps=self.eps, use_temb=self.use_temb,
                          dtype=self.dtype, name="spatial_res_block")(x, temb)
        n, hh, ww, c = h.shape
        b = n // num_frames
        h_video = h.reshape(b, num_frames, hh, ww, c)
        temb_video = None
        if self.use_temb and temb is not None:
            temb_video = temb.reshape(b, num_frames, -1)
        h_temporal = TemporalResnetBlock(
            self.out_channels,
            eps=self.temporal_eps if self.temporal_eps is not None else self.eps,
            use_temb=self.use_temb, dtype=self.dtype, name="temporal_res_block",
        )(h_video, temb_video)
        h_video = AlphaBlender(self.merge_factor, reverse=self.reverse_time_mix,
                               name="time_mixer")(h_video, h_temporal)
        return h_video.reshape(n, hh, ww, c)


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv. The UNet uses symmetric padding 1
    (reference unet.py:1474); the VAE encoder pads asymmetrically
    (0,1)x(0,1) (reference vae.py:733-737)."""

    out_channels: int
    asymmetric_padding: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.asymmetric_padding:
            pad = ((0, 1), (0, 1))
        else:
            pad = ((1, 1), (1, 1))
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=pad,
                       dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)


class _SubpixelUpConv(nn.Module):
    """3x3 conv applied to a nearest-2x-upsampled input WITHOUT materialising
    the 4x tensor: on the 2x-nearest grid, each 3x3 window touches at most
    2x2 DISTINCT input pixels, so the conv decomposes exactly into four 2x2
    phase convolutions on the original grid whose kernels are row/column
    sums of the 3x3 kernel (4/9 the MXU FLOPs and no 4x HBM intermediate).

    Output parity (pr, pc) selects the phase: even output rows read input
    rows (r-1, r) with kernel rows (w0, w1+w2); odd rows read (r, r+1) with
    (w0+w1, w2); columns likewise. Parameter tree is identical to
    nn.Conv(features, (3,3)) so checkpoints are interchangeable.
    """

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        dt = self.dtype or x.dtype
        w = kernel  # combine taps in fp32, then cast once
        rows = {
            0: jnp.stack([w[0], w[1] + w[2]]),          # even out rows
            1: jnp.stack([w[0] + w[1], w[2]]),          # odd out rows
        }
        phases = {}
        for pr in (0, 1):
            wr = rows[pr]
            cols = {
                0: jnp.stack([wr[:, 0], wr[:, 1] + wr[:, 2]], axis=1),
                1: jnp.stack([wr[:, 0] + wr[:, 1], wr[:, 2]], axis=1),
            }
            for pc in (0, 1):
                k = cols[pc].astype(dt)                  # [2, 2, cin, cout]
                pad = ((1 - pr, pr), (1 - pc, pc))
                phases[(pr, pc)] = jax.lax.conv_general_dilated(
                    x.astype(dt), k, window_strides=(1, 1), padding=pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + bias.astype(dt)
        # interleave: out[n, 2r+pr, 2c+pc] = phases[(pr, pc)][n, r, c]
        n, h, wdt, c = phases[(0, 0)].shape
        row0 = jnp.stack([phases[(0, 0)], phases[(0, 1)]], axis=3)
        row1 = jnp.stack([phases[(1, 0)], phases[(1, 1)]], axis=3)
        out = jnp.stack([row0, row1], axis=2)            # [n, h, 2, w, 2, c]
        return out.reshape(n, 2 * h, 2 * wdt, c)


class Upsample2D(nn.Module):
    """Nearest x2 + 3x3 conv (reference unet.py:1771-1809).

    subpixel=True (default) runs the mathematically identical 4-phase
    decomposition (_SubpixelUpConv) instead of materialising the 4x
    upsampled tensor."""

    out_channels: int
    subpixel: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.subpixel:
            return _SubpixelUpConv(self.out_channels, dtype=self.dtype,
                                   name="conv")(x)
        x = upsample_nearest_2x(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")(x)


class GEGLU(nn.Module):
    """x W1 * gelu(x W2), fused as one projection (reference unet.py:859-870).
    torch F.gelu default is the exact erf form."""

    dim_out: int
    quant: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.quant:
            # the projection, split, gelu and multiply dispatch as ONE op
            # (fused in-kernel on the Pallas int8 path); param tree is the
            # same QuantDense proj/{kernel,bias}
            return QuantDense(self.dim_out * 2, dtype=self.dtype,
                              name="proj", geglu=True)(x)
        proj = make_dense(self.dim_out * 2, dtype=self.dtype,
                          name="proj")(x)
        value, gate = jnp.split(proj, 2, axis=-1)
        return value * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """GEGLU -> linear (reference unet.py:827-857)."""

    dim_out: Optional[int] = None
    mult: int = 4
    quant: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = int(dim * self.mult)
        out = self.dim_out if self.dim_out is not None else dim
        x = GEGLU(inner, quant=self.quant, dtype=self.dtype, name="act")(x)
        x = make_dense(out, dtype=self.dtype, name="proj_out",
                       quant=self.quant)(x)
        return x
