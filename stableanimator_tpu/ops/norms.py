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
    Statistics are computed per (sample, group) over spatial dims and the
    channels inside the group, in float32.
    """
    orig_dtype = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by num_groups {num_groups}")
    x32 = x.astype(jnp.float32).reshape(n, -1, num_groups, c // num_groups)
    mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 3), keepdims=True)
    x32 = (x32 - mean) * lax.rsqrt(var + eps)
    x32 = x32.reshape(x.shape)
    out = x32 * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the last axis, fp32 statistics. scale/bias: [C]."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * lax.rsqrt(var + eps)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
