"""Normalisation primitives with explicit fp32 statistics.

torch GroupNorm/LayerNorm compute statistics in the input dtype but the
reference runs norms on fp16 activations where torch internally upcasts;
on TPU we always compute statistics in float32 and cast back, which is both
faster (VPU-friendly fused rsqrt) and strictly more accurate under bf16.

Channels-last layout: inputs are [..., C]; GroupNorm reduces over all
non-batch axes within each channel group, matching torch's contiguous
channel grouping (torch.nn.GroupNorm semantics used throughout reference
animation/modules/unet.py and vae.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def group_norm(x, scale, bias, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm over a channels-last tensor.

    x: [N, *spatial, C]; scale/bias: [C].
    Statistics are accumulated in float32, then the normalisation is applied
    as one fused multiply-add `x * a + b` in the input dtype (a/b are tiny
    per-group fp32 scalars folded with scale/bias) — this keeps the HBM
    traffic at one read + one write of x instead of fp32 round-trips.
    """
    orig_dtype = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by num_groups {num_groups}")
    xg = x.reshape(n, -1, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(lax.square(xg.astype(jnp.float32)), axis=(1, 3),
                       keepdims=True)
    var = jnp.maximum(mean_sq - lax.square(mean), 0.0)
    inv = lax.rsqrt(var + eps)                         # [n, 1, G, 1] fp32
    # fold per-group stats with per-channel affine: out = x * a + b.
    # a/b are tiny and computed fp32; the apply runs in the input dtype so
    # no fp32 copy of x is ever materialised (a 4.5 GB tensor at the VAE
    # decoder's 576x1024 level-0).
    scale32 = scale.astype(jnp.float32).reshape(1, 1, num_groups, c // num_groups)
    bias32 = bias.astype(jnp.float32).reshape(1, 1, num_groups, c // num_groups)
    a = (inv * scale32).astype(orig_dtype)
    b = (bias32 - mean * (inv * scale32)).astype(orig_dtype)
    out = xg * a + b
    return out.reshape(x.shape)


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the last axis; fp32 statistics, fused affine apply in
    the input dtype (no fp32 copy of x)."""
    orig_dtype = x.dtype
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    mean_sq = jnp.mean(lax.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - lax.square(mean), 0.0)
    inv = lax.rsqrt(var + eps)
    a = inv * (scale.astype(jnp.float32) if scale is not None else 1.0)
    b = -mean * a + (bias.astype(jnp.float32) if bias is not None else 0.0)
    out = x * a.astype(orig_dtype) + b.astype(orig_dtype)
    return out
