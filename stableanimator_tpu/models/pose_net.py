"""PoseNet: skeleton-image encoder whose output is added to the UNet's
conv_in activations per frame. Re-expresses reference
animation/modules/pose_net.py:9-47.

Input  [N, H, W, 3]   pose renderings in [-1, 1]  (N = batch * frames)
Output [N, H/8, W/8, noise_latent_channels], multiplied by a learned scalar
`scale` (init 2.0).

The final 1x1 projection is zero-initialised so that a freshly initialised
PoseNet is a no-op on the UNet — the standard ControlNet-style warm start
for the training path (the reference ships trained weights; its own init is
irrelevant to inference parity).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from stableanimator_tpu.core.config import PoseNetConfig

Dtype = jnp.dtype


class PoseNet(nn.Module):
    config: PoseNetConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        c = cfg.conv_channels  # (3, 16, 32, 64, 128) at full size

        def conv(features, kernel, stride, name):
            return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                           padding=kernel // 2 if kernel == 3 else 1,
                           dtype=self.dtype, param_dtype=jnp.float32, name=name)

        # 8-layer SiLU stack: 3x3 refine + 4x4/2 downsample pairs
        # (reference pose_net.py:14-34)
        x = jax.nn.silu(conv(c[0], 3, 1, "conv_layers_0")(x))
        x = jax.nn.silu(conv(c[1], 4, 2, "conv_layers_2")(x))
        x = jax.nn.silu(conv(c[1], 3, 1, "conv_layers_4")(x))
        x = jax.nn.silu(conv(c[2], 4, 2, "conv_layers_6")(x))
        x = jax.nn.silu(conv(c[2], 3, 1, "conv_layers_8")(x))
        x = jax.nn.silu(conv(c[3], 4, 2, "conv_layers_10")(x))
        x = jax.nn.silu(conv(c[3], 3, 1, "conv_layers_12")(x))
        x = jax.nn.silu(conv(c[4], 3, 1, "conv_layers_14")(x))

        x = nn.Conv(cfg.noise_latent_channels, (1, 1),
                    kernel_init=nn.initializers.zeros, dtype=self.dtype,
                    param_dtype=jnp.float32, name="final_proj")(x)
        scale = self.param(
            "scale",
            lambda key, shape: jnp.full(shape, cfg.scale_init, jnp.float32),
            (1,),
        )
        return x * scale.astype(x.dtype)
