"""CLIP vision tower with projection head — the SVD image conditioner.

A standalone Flax ViT matching HF `CLIPVisionModelWithProjection` as used by
the reference (inference_basic.py:241-248: laion CLIP ViT-H/14, projection
to 1024). Weights are converted from the HF checkpoint by
convert/torch_to_jax.py; the framework has no runtime transformers
dependency.

Pipeline-side preprocessing (antialiased resize to 224^2 + CLIP
normalisation; reference inference_pipeline_animation.py:192-221) lives in
pipeline/animation.py.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from stableanimator_tpu.core.config import CLIPVisionConfig
from stableanimator_tpu.models.layers import LayerNorm

Dtype = jnp.dtype

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


class CLIPEncoderLayer(nn.Module):
    config: CLIPVisionConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        d = cfg.hidden_size
        h = LayerNorm(eps=cfg.layer_norm_eps, name="layer_norm1")(x)
        n, s, _ = h.shape
        heads, hd = cfg.num_heads, d // cfg.num_heads

        def proj(name):
            return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name=name)(h)

        q = proj("q_proj").reshape(n, s, heads, hd)
        k = proj("k_proj").reshape(n, s, heads, hd)
        v = proj("v_proj").reshape(n, s, heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        att = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(n, s, d)
        att = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                       name="out_proj")(att)
        x = x + att

        h = LayerNorm(eps=cfg.layer_norm_eps, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(h)
        return x + h


class CLIPVisionModelWithProjection(nn.Module):
    """pixel_values [B, H, W, 3] (CLIP-normalised) -> image_embeds
    [B, projection_dim]."""

    config: CLIPVisionConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        b = pixel_values.shape[0]
        patches = nn.Conv(cfg.hidden_size,
                          (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          use_bias=False, padding="VALID", dtype=self.dtype,
                          param_dtype=jnp.float32, name="patch_embedding")(pixel_values)
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,))
        cls = jnp.broadcast_to(cls.astype(patches.dtype)[None, None],
                               (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        num_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (num_pos, cfg.hidden_size))
        x = x + pos.astype(x.dtype)[None]

        x = LayerNorm(eps=cfg.layer_norm_eps, name="pre_layrnorm")(x)
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        pooled = x[:, 0]
        pooled = LayerNorm(eps=cfg.layer_norm_eps, name="post_layernorm")(pooled)
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="visual_projection")(pooled)
