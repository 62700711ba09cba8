"""StableAnimator-TPU: identity-preserving human image animation, TPU-native.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
delldu/StableAnimator (reference: /root/reference): an SVD-derived
spatio-temporal video UNet with PoseNet pose conditioning, a global
content-aware Face Encoder, and a distribution-aware ID-Adapter
cross-attention, driven by an EDM/Euler denoising loop with temporal tiling
and a temporal-decoder KL VAE.

Design stance (TPU-first, not a port):
  * channels-last [B, F, H, W, C] video layout everywhere; frames fold into
    the batch for spatial ops and into tokens for temporal ops,
  * one jitted lax.scan for the whole denoising loop; CFG and temporal tiles
    are batched into a single UNet call per step,
  * Pallas flash-attention kernels for the hot spatial self-attention,
  * bf16 compute with fp32 islands (time embeddings, norm statistics,
    VAE encode, scheduler math),
  * jax.sharding Mesh + pjit for multi-chip: data/frame-parallel inference,
    data-parallel training with psum gradient reduction over ICI.
"""

__version__ = "0.1.0"
