"""Attention dispatch: Pallas flash kernel for long sequences, XLA for tiny kv.

Every attention in the model routes through `dot_product_attention`
([B, S, H, D] layout, jax.nn convention):

  * spatial self-attention over H*W tokens (4096 .. 9216)  -> Pallas flash
  * temporal self-attention over F<=16 frames              -> XLA (seq tiny)
  * cross-attention with 1..5 key tokens                   -> XLA (kv tiny)

Matches the reference semantics of xformers `memory_efficient_attention`
with default scale 1/sqrt(head_dim) and no bias/mask/dropout
(reference animation/modules/unet.py:1812-2029).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from stableanimator_tpu.ops.flash_attention import flash_attention

# below this many kv tokens the flash kernel has nothing to win: a single
# XLA fused softmax-matmul is optimal and avoids kernel-launch overhead.
# (512 also routes the 576-token level-2 attention of the 576x1024 pro
# config through flash, avoiding an 8.5 GB fp32 logits tensor.)
_FLASH_MIN_SEQ = 512


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def xla_attention(q, k, v, scale: float | None = None):
    """Reference-math attention in pure XLA, fp32 softmax. [B, S, H, D]."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _flash_sharded(q, k, v, scale, mesh):
    """Flash attention inside a mesh-sharded program.

    GSPMD cannot partition Mosaic custom calls (the real-topology v5e:2x4
    AOT compile fails with "Mosaic kernels cannot be automatically
    partitioned") — but the kernel is independent per (batch, head), so any
    batch partitioning is mathematically exact: constrain q/k/v to shard
    the batch axis over ALL mesh axes and run the kernel per-shard under
    shard_map. This keeps the first-party kernel (4.5-7x faster than the
    alternatives at model shapes, NOTES_ROUND3) on the multi-chip path
    instead of falling back to XLA attention (whose fp32 logits at the
    512^2 level-0 shape are OOM-scale)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(tuple(mesh.axis_names), None, None, None)
    sh = NamedSharding(mesh, spec)
    q = jax.lax.with_sharding_constraint(q, sh)
    k = jax.lax.with_sharding_constraint(k, sh)
    v = jax.lax.with_sharding_constraint(v, sh)
    fn = shard_map(
        functools.partial(flash_attention, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False)
    return fn(q, k, v)


def dot_product_attention(q, k, v, scale: float | None = None,
                          use_flash: bool | None = None):
    """Attention over [B, S, H, D] tensors.

    use_flash: True/False forces the path; None auto-selects (flash on TPU
    for kv >= 1024 tokens).
    """
    if use_flash is None:
        # 16-bit dtypes only: the kernel's VMEM block budget is sized for
        # 2-byte elements (fp32 islands like the VAE encoder would double
        # it); fp32 callers keep the XLA path
        use_flash = (_on_tpu() and k.shape[1] >= _FLASH_MIN_SEQ
                     and q.shape[1] >= 128 and q.dtype.itemsize == 2)
    if use_flash:
        from stableanimator_tpu.ops.gate import active_mesh

        mesh = active_mesh()
        if mesh is not None:
            if q.shape[0] % mesh.size == 0:
                return _flash_sharded(q, k, v, scale, mesh)
            # batch not evenly shardable (e.g. small decode chunks):
            # plain XLA keeps GSPMD free to partition however it likes
            return xla_attention(q, k, v, scale=scale)
        return flash_attention(q, k, v, scale=scale)
    return xla_attention(q, k, v, scale=scale)
