"""FusionFaceId: the global content-aware Face Encoder.

Maps a 512-d ArcFace identity embedding to `num_tokens` tokens of
cross-attention width, then refines them against the CLIP image embedding
with a 4-layer perceiver. Re-expresses reference
animation/modules/id_encoder.py:15-148.

Numerical fine points preserved:
  * PerceiverAttention applies 1/sqrt(sqrt(dim_head)) to BOTH q and k
    (so the product is the usual 1/sqrt(d)) and softmaxes in float32
    (id_encoder.py:48-50),
  * keys/values attend over concat(clip_tokens, latents) (id_encoder.py:40),
  * GELUs are the exact erf form (torch defaults).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from stableanimator_tpu.core.config import FaceEncoderConfig
from stableanimator_tpu.models.layers import LayerNorm

Dtype = jnp.dtype


class PerceiverAttention(nn.Module):
    heads: int
    dim_head: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, latents):
        dim = latents.shape[-1]
        inner = self.heads * self.dim_head
        x = LayerNorm(name="norm1")(x)
        latents = LayerNorm(name="norm2")(latents)
        b, l, _ = latents.shape

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_q")(latents)
        kv_input = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="to_kv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        s = kv_input.shape[1]
        q = q.reshape(b, l, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        scale = 1.0 / math.sqrt(math.sqrt(self.dim_head))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return nn.Dense(dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="to_out")(out)


class PerceiverFeedForward(nn.Module):
    """LayerNorm -> Linear(no bias) -> GELU -> Linear(no bias)
    (reference id_encoder.py:58-65)."""

    mult: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        x = LayerNorm(name="norm")(x)
        x = nn.Dense(dim * self.mult, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(x)
        return x


class FacePerceiver(nn.Module):
    """proj_in -> depth x (attn + ff, residual) -> proj_out -> LayerNorm
    (reference id_encoder.py:67-100)."""

    config: FaceEncoderConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, latents, clip_embeds):
        cfg = self.config
        x = nn.Dense(cfg.cross_attention_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj_in")(clip_embeds)
        for i in range(cfg.depth):
            latents = latents + PerceiverAttention(
                cfg.heads, cfg.dim_head, dtype=self.dtype,
                name=f"layers_{i}_attn")(x, latents)
            latents = latents + PerceiverFeedForward(
                cfg.ff_mult, dtype=self.dtype, name=f"layers_{i}_ff")(latents)
        latents = nn.Dense(cfg.cross_attention_dim, dtype=self.dtype,
                           param_dtype=jnp.float32, name="proj_out")(latents)
        return LayerNorm(name="norm_out")(latents)


class FusionFaceId(nn.Module):
    """id_embeds [B, id_dim] + clip_embeds [B, 1, clip_dim] ->
    [B, num_tokens, cross_attention_dim] (reference id_encoder.py:102-148)."""

    config: FaceEncoderConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, id_embeds, clip_embeds):
        cfg = self.config
        x = nn.Dense(cfg.id_embeddings_dim * 2, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj_0")(id_embeds)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(cfg.cross_attention_dim * cfg.num_tokens, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj_2")(x)
        x = x.reshape(-1, cfg.num_tokens, cfg.cross_attention_dim)
        x = LayerNorm(name="norm")(x)
        return FacePerceiver(cfg, dtype=self.dtype, name="fusion_model")(x, clip_embeds)
