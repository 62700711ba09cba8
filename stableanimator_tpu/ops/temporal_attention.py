"""Pallas kernel: temporal self-attention directly in the SPATIAL layout.

The video UNet's temporal transformer attends across the F frames at every
fixed spatial position (reference animation/modules/unet.py:872-958, which
materialises the [B*H*W, F, C] transpose of the whole stream). Round 2
moved the surrounding block into the spatial token layout, leaving four
HBM transposes per attention (q, k, v in; o out) plus an XLA batched
matmul over F=16-token sequences — MXU-hostile shapes (16x64x16 per
position) that XLA pads to a fraction of the systolic array.

This kernel removes both costs: q/k/v stream through VMEM in their native
[B, F, S, H*D] spatial layout (the frame axis is just a leading block
dimension — the "transpose" happens for free in VMEM addressing), and the
F x F attention runs as VPU broadcast-multiply-reduces, which at F=16 are
faster than MXU matmuls padded 8x.

Per grid cell (batch, s-block): blocks [1, F, block_s, H*D]; per head an
unrolled loop over the F key frames computes logits [F, F, block_s] in
fp32, an exact softmax over the key-frame axis, and the value reduction.
Numerics match ops.attention.xla_attention: fp32 logits/softmax,
probabilities cast to the value dtype for the weighted sum, fp32
accumulation.

Backward: custom VJP that recomputes through the reference jnp formulation
(transpose + xla_attention) — exact gradients of the same math; the
kernel is a forward-path optimisation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu importable only on TPU builds; CPU tests run interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block_s(s_len: int, f: int, hd: int) -> int:
    """VMEM-budgeted spatial block: Pallas double-buffers all four operand
    blocks (8 * F * block_s * hd * 2B), and the kernel body's fp32
    q/k/acc copies, per-key-frame logit planes and the Mosaic relayouts
    around the lane-axis reductions cost roughly as much again — a 4 MB
    operand budget is what fits every model shape inside the ~16 MB scoped
    VMEM (swept empirically with tools/aot_check.py: 6 MB already OOMs at
    hd=320)."""
    budget = 4 * 1024 * 1024
    bs = budget // (8 * f * hd * 2)
    bs = max(8, min(512, bs))
    bs = (bs // 8) * 8
    return min(bs, _round_up(s_len, 8))


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, num_heads, num_frames):
    """Blocks [1, F, block_s, hd]; all heads fused on the lane axis and
    sliced per head (same pattern as the flash kernel).

    The F x F logits never materialise as one array: key frames are
    visited as static slices and the softmax runs across the per-key-frame
    [F, bs] planes (jnp.stack / integer indexing lower to >2D gathers,
    which Mosaic rejects — found by the chipless AOT topology compile)."""
    hd = q_ref.shape[-1]
    d = hd // num_heads
    f = num_frames
    for hi in range(num_heads):
        lo = hi * d
        q = q_ref[0, :, :, lo:lo + d].astype(jnp.float32) * scale  # [F,bs,d]
        k = k_ref[0, :, :, lo:lo + d].astype(jnp.float32)
        v = v_ref[0, :, :, lo:lo + d]
        # logits per key frame g: broadcast-multiply against all query
        # frames and reduce the head dim on the lane axis -> [F, bs]
        ls = []
        for g in range(f):
            kg = jax.lax.slice_in_dim(k, g, g + 1, axis=0)         # [1,bs,d]
            ls.append(jnp.sum(q * kg, axis=-1))
        m = functools.reduce(jnp.maximum, ls)                      # [F, bs]
        es = [jnp.exp(l - m) for l in ls]
        den = functools.reduce(jnp.add, es)
        acc = jnp.zeros(q.shape, jnp.float32)
        for g in range(f):
            vg = jax.lax.slice_in_dim(v, g, g + 1, axis=0)         # [1,bs,d]
            # probs in the value dtype (xla_attention numerics), fp32 accum
            w = (es[g] / den).astype(v.dtype)                      # [F, bs]
            acc = acc + (w[..., None] * vg).astype(jnp.float32)
        o_ref[0, :, :, lo:lo + d] = acc.astype(o_ref.dtype)


def _temporal_attn_fwd_impl(q, k, v, num_frames, num_heads, scale, interpret):
    """q/k/v: [B*F, S, H*D] spatial layout -> same-shape output."""
    n, s_len, hd = q.shape
    b = n // num_frames
    bs = _pick_block_s(s_len, num_frames, hd)
    s_pad = _round_up(s_len, bs)

    def prep(x):
        x = x.reshape(b, num_frames, s_len, hd)
        if s_pad != s_len:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s_len), (0, 0)))
        return x

    qf, kf, vf = prep(q), prep(k), prep(v)
    grid = (b, s_pad // bs)
    sk = {"memory_space": pltpu.VMEM} if _HAS_PLTPU and not interpret else {}
    spec = pl.BlockSpec((1, num_frames, bs, hd),
                        lambda bi, i: (bi, 0, i, 0), **sk)
    kernel = functools.partial(_kernel, scale=scale, num_heads=num_heads,
                               num_frames=num_frames)
    o = pl.pallas_call(
        kernel, grid=grid, in_specs=[spec, spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, num_frames, s_pad, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return o[:, :, :s_len].reshape(n, s_len, hd)


def _reference_jnp(q, k, v, num_frames, num_heads, scale):
    """The transpose-based formulation (exact same math; used for the VJP
    and as the CPU/test oracle)."""
    from stableanimator_tpu.ops.attention import xla_attention

    n, s_len, hd = q.shape
    b = n // num_frames
    d = hd // num_heads

    def to_frame_major(t):
        t = t.reshape(b, num_frames, s_len, num_heads, d)
        return t.transpose(0, 2, 1, 3, 4).reshape(
            b * s_len, num_frames, num_heads, d)

    o = xla_attention(to_frame_major(q), to_frame_major(k),
                      to_frame_major(v), scale=scale)
    o = (o.reshape(b, s_len, num_frames, num_heads, d)
         .transpose(0, 2, 1, 3, 4))
    return o.reshape(n, s_len, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _temporal_attention_core(q, k, v, num_frames, num_heads, scale, interpret):
    return _temporal_attn_fwd_impl(q, k, v, num_frames, num_heads, scale,
                                   interpret)


def _core_fwd(q, k, v, num_frames, num_heads, scale, interpret):
    o = _temporal_attn_fwd_impl(q, k, v, num_frames, num_heads, scale,
                                interpret)
    return o, (q, k, v)


def _core_bwd(num_frames, num_heads, scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _reference_jnp(q_, k_, v_, num_frames, num_heads,
                                          scale), q, k, v)
    return vjp(g)


_temporal_attention_core.defvjp(_core_fwd, _core_bwd)


def temporal_attention_spatial(q, k, v, num_frames: int, num_heads: int,
                               scale: float | None = None,
                               interpret: bool = False):
    """Temporal self-attention over the frame axis, inputs/outputs in the
    spatial token layout [B*F, S, H*D] (no transposes materialised).

    scale defaults to 1/sqrt(head_dim)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1] // num_heads)
    return _temporal_attention_core(q, k, v, num_frames, num_heads,
                                    float(scale), interpret)
