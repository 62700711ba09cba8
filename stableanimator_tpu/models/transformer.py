"""Spatio-temporal transformer stack with the StableAnimator ID adapter.

Re-expresses (not ports):
  Attention + processors       reference animation/modules/unet.py:711-825,
                               1812-2029 (xformers processors become a single
                               dispatch through ops/attention.py)
  BasicTransformerBlock        reference unet.py:478-557
  TemporalBasicTransformerBlock reference unet.py:872-958
  TransformerSpatioTemporalModel reference unet.py:559-708

The "ID adapter" is the paper's core trick: spatial cross-attention splits
its context into [CLIP image token | num_id_tokens face tokens], attends to
both separately (separate id_to_k/id_to_v projections), renormalises the
face stream to the base stream's mean/std, and adds
(reference unet.py:1968-2022).

Layouts: spatial tokens [N, H*W, C] with N = batch*frames; temporal tokens
[B*H*W, F, C]. All attention goes through ops.dot_product_attention which
routes long sequences to the Pallas flash kernel.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from stableanimator_tpu.models.layers import (
    AlphaScalar,
    FeedForward,
    GroupNorm,
    LayerNorm,
    TimestepEmbedding,
    make_dense,
    sinusoidal_embedding,
)
from stableanimator_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype


class Attention(nn.Module):
    """Multi-head attention: self (context=None) or cross.

    to_q/to_k/to_v have no bias, to_out does
    (reference unet.py:744-750)."""

    heads: int
    dim_head: int
    out_dim: int
    use_flash: Optional[bool] = None
    quant: bool = False
    # (batch, frames): input tokens are [batch*frames, S, C] in the spatial
    # layout and SELF-attention mixes across the frame axis at fixed spatial
    # position (temporal attention) — only q/k/v/out are transposed, the
    # projections run in the MXU-friendly spatial layout.
    seq_axis_group: Optional[tuple] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        is_self = context is None
        if context is None:
            context = x
        n, sq, _ = x.shape
        # The single-key shortcut below is only valid when the ATTENTION
        # axis has one element. For temporal self-attention (seq_axis_group
        # set) the attention axis after the frame-major transpose is the F
        # frames, not context.shape[1] (which is the spatial token count) —
        # firing the shortcut there would silently drop all cross-frame
        # mixing (hit at 1x1 spatial, e.g. tiny-config mid blocks).
        single_key = context.shape[1] == 1 and not (
            is_self and self.seq_axis_group is not None
            and self.seq_axis_group[1] != 1)
        if single_key:
            # Exact shortcut: softmax over a single key is identically 1, so
            # the output is just to_out(to_v(context)) broadcast over the
            # query axis — q/k never influence the value (and their grads
            # are exactly zero). This is the temporal cross-attention case:
            # time_context is one CLIP token (reference unet.py:640-654).
            # to_q/to_k params are still created for checkpoint parity; the
            # dummy row is dead code XLA eliminates.
            nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_q")(x[:, :1])
            nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_k")(context)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="to_v")(context)
            o = nn.Dense(self.out_dim, use_bias=True, dtype=self.dtype,
                         param_dtype=jnp.float32, name="to_out")(v)
            return jnp.broadcast_to(o, (n, sq, self.out_dim))
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_v")(context)
        sk = k.shape[1]
        if is_self and self.seq_axis_group is not None:
            b, f = self.seq_axis_group
            # Under a (data, frame) mesh the spatial layout shards
            # frames; contracting over F would otherwise all-gather the
            # whole activation across the frame axis (measured 83 GB /
            # pro video, tools/estimate_multichip.py). Sequence-parallel
            # reshard instead: constrain the frame-major tensors to
            # shard their batch*spatial rows over BOTH mesh axes —
            # GSPMD turns the transposes into all-to-alls (1/n of the
            # data on the wire) and the attention itself is fully local.
            from stableanimator_tpu.ops.gate import active_mesh

            mesh = active_mesh()

            def _seqpar(t):
                # rows must tile evenly onto the mesh (tiny/micro
                # configs reach 1x1 spatial where they don't — keep
                # GSPMD's own choice there)
                if mesh is None or t.shape[0] % mesh.size != 0:
                    return t
                from jax.sharding import NamedSharding, PartitionSpec

                spec = PartitionSpec(tuple(mesh.axis_names),
                                     *([None] * (t.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    t, NamedSharding(mesh, spec))

            def to_frame_major(t):
                t = t.reshape(b, f, sq, self.heads, self.dim_head)
                return _seqpar(t.transpose(0, 2, 1, 3, 4).reshape(
                    b * sq, f, self.heads, self.dim_head))

            q = q.reshape(n, sq, self.heads, self.dim_head)
            k = k.reshape(n, sk, self.heads, self.dim_head)
            v = v.reshape(n, sk, self.heads, self.dim_head)
            o = dot_product_attention(to_frame_major(q), to_frame_major(k),
                                      to_frame_major(v), use_flash=False)
            o = (o.reshape(b, sq, f, self.heads, self.dim_head)
                 .transpose(0, 2, 1, 3, 4)).reshape(n, sq, inner)
        else:
            q = q.reshape(n, sq, self.heads, self.dim_head)
            k = k.reshape(n, sk, self.heads, self.dim_head)
            v = v.reshape(n, sk, self.heads, self.dim_head)
            o = dot_product_attention(q, k, v, use_flash=self.use_flash)
        o = o.reshape(n, sq, inner)
        return make_dense(self.out_dim, use_bias=True, dtype=self.dtype,
                          name="to_out", quant=self.quant)(o)


class IDCrossAttention(nn.Module):
    """Dual-stream cross-attention with distribution renormalisation
    (AnimationIDAttnNormalizedProcessor, reference unet.py:1916-2029).

    context = [base tokens (CLIP image embedding) | num_id_tokens face
    tokens]; the face stream uses separate id_to_k/id_to_v and is
    renormalised to the base stream's per-sample mean/std before the add.
    """

    heads: int
    dim_head: int
    out_dim: int
    num_id_tokens: int = 4
    quant: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context):
        inner = self.heads * self.dim_head
        end_pos = context.shape[1] - self.num_id_tokens
        base_ctx = context[:, :end_pos, :]
        id_ctx = context[:, end_pos:, :]

        n, sq, _ = x.shape
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_q")(x)
        q = q.reshape(n, sq, self.heads, self.dim_head)

        def attend(ctx, k_name, v_name):
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name=k_name)(ctx)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name=v_name)(ctx)
            sk = k.shape[1]
            if sk == 1:
                # softmax over one key == 1 exactly; q/k are dead math
                # (the single-CLIP-token base stream at inference)
                return jnp.broadcast_to(v, (n, sq, inner))
            k = k.reshape(n, sk, self.heads, self.dim_head)
            v = v.reshape(n, sk, self.heads, self.dim_head)
            o = dot_product_attention(q, k, v, use_flash=False)  # kv is tiny
            return o.reshape(n, sq, inner)

        base = attend(base_ctx, "to_k", "to_v")
        ident = attend(id_ctx, "id_to_k", "id_to_v")

        # distribution renormalisation (reference unet.py:2018-2022), fp32
        # statistics with torch.std's Bessel correction. Stats are one-pass
        # fused fp32 reductions and the renorm collapses to a per-sample
        # affine applied in the compute dtype — no fp32 copy of the [N,S,C]
        # streams is ever materialised (they are the largest activations in
        # the spatial block: ~170 MB each at 512^2 level-0).
        def _stats(t):
            cnt = t.shape[1] * t.shape[2]
            mean = jnp.mean(t, axis=(1, 2), keepdims=True, dtype=jnp.float32)
            mean_sq = jnp.mean(jnp.square(t.astype(jnp.float32)), axis=(1, 2),
                               keepdims=True)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            var = var * (cnt / max(cnt - 1, 1))
            return mean, jnp.sqrt(var)

        mean_b, std_b = _stats(base)
        mean_i, std_i = _stats(ident)
        k_aff = std_b / (std_i + 1e-5)
        b_aff = mean_b - mean_i * k_aff
        ident = ident * k_aff.astype(base.dtype) + b_aff.astype(base.dtype)

        o = base + ident
        return make_dense(self.out_dim, use_bias=True, dtype=self.dtype,
                          name="to_out", quant=self.quant)(o)


class BasicTransformerBlock(nn.Module):
    """Spatial block: self-attn -> ID cross-attn -> GEGLU FF, pre-LN
    residuals (reference unet.py:478-557)."""

    heads: int
    dim_head: int
    num_id_tokens: int = 4
    use_flash: Optional[bool] = None
    quant: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context):
        dim = x.shape[-1]
        h = LayerNorm(name="norm1")(x)
        x = x + Attention(self.heads, self.dim_head, dim, use_flash=self.use_flash,
                          quant=self.quant, dtype=self.dtype, name="attn1")(h)
        h = LayerNorm(name="norm2")(x)
        x = x + IDCrossAttention(self.heads, self.dim_head, dim,
                                 num_id_tokens=self.num_id_tokens,
                                 quant=self.quant,
                                 dtype=self.dtype, name="attn2")(h, context)
        h = LayerNorm(name="norm3")(x)
        x = x + FeedForward(quant=self.quant, dtype=self.dtype, name="ff")(h)
        return x


class TemporalBasicTransformerBlock(nn.Module):
    """Temporal block over the frame axis (reference unet.py:872-958).

    Input arrives as spatial tokens [N, S, C] (N = B*F); it is transposed to
    [B*S, F, C], run through ff_in + self-attn over F + cross-attn to the
    first-frame CLIP token + FF, then transposed back.
    """

    heads: int
    dim_head: int
    num_frames: int = 1
    quant: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, time_context, frame_emb=None, mix_alpha=None):
        """mix_alpha: optional scalar a — when given, the module returns
        a * x + (1 - a) * temporal_out, blended in place.

        Layout: the whole block runs in the SPATIAL token layout
        [B*F, S, C] — every sub-op except the attention core (LayerNorm,
        ff_in, ff, the frame-embedding add, the alpha blend) is per-token
        and therefore layout-agnostic, and the qkv/out projections are
        ordinary per-token matmuls too. Only q, k, v are transposed to the
        frame-major layout for the F-mixing attention and the output
        transposed back: ~4 copies of the (smaller) head tensors instead
        of 2 copies of the full activation PLUS the d-minor relayouts XLA
        inserted around every matmul it had to run in the batch-minor
        temporal layout (measured ~2.7 ms/block at 512^2: the largest
        non-matmul cost in the denoise step). Identical math to the
        reference's transpose-everything formulation (unet.py:872-958)."""
        num_frames = self.num_frames
        n, s, c = x.shape
        b = n // num_frames
        h = x
        if frame_emb is not None:
            # frame_emb [B*F, 1, C] broadcasts directly in spatial layout
            h = h + frame_emb.astype(h.dtype)

        residual = h
        h = LayerNorm(name="norm_in")(h)
        h = FeedForward(dim_out=c, quant=self.quant, dtype=self.dtype,
                        name="ff_in")(h)
        h = h + residual

        hn = LayerNorm(name="norm1")(h)
        h = h + Attention(self.heads, self.dim_head, c, use_flash=False,
                          seq_axis_group=(b, num_frames), quant=self.quant,
                          dtype=self.dtype, name="attn1")(hn)
        hn = LayerNorm(name="norm2")(h)
        # cross-attention to the single first-frame CLIP token: context has
        # one key, so this hits the exact softmax==1 shortcut in Attention
        # (to_out(to_v(ctx)) broadcast) — no transpose needed at all
        h = h + Attention(self.heads, self.dim_head, c, use_flash=False,
                          seq_axis_group=(b, num_frames), quant=self.quant,
                          dtype=self.dtype, name="attn2")(hn, time_context)
        hn = LayerNorm(name="norm3")(h)
        h = h + FeedForward(quant=self.quant, dtype=self.dtype, name="ff")(hn)

        if mix_alpha is not None:
            a = mix_alpha.astype(h.dtype)
            h = a * x + (1.0 - a) * h
        return h


class TransformerSpatioTemporalModel(nn.Module):
    """Spatial + temporal transformer pair with frame positional embedding
    and learned AlphaBlender mix (reference unet.py:559-708).

    Input [N, H, W, C_in] (N = B*F); context [N, 1+num_id_tokens, cross_dim].
    """

    heads: int
    dim_head: int
    num_frames: int = 1
    num_layers: int = 1
    num_id_tokens: int = 4
    use_flash: Optional[bool] = None
    quant: bool = False
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, context):
        num_frames = self.num_frames
        n, hh, ww, c_in = x.shape
        b = n // num_frames
        inner = self.heads * self.dim_head
        s = hh * ww

        # time_context: the base (CLIP) tokens of frame 0 (reference
        # unet.py:640-654). The temporal block runs in the spatial token
        # layout, so the context only needs replication over the frame axis
        # ([B*F, end_pos, dim]) — not over every spatial position as the
        # reference materialises it.
        end_pos = context.shape[1] - self.num_id_tokens
        time_context = context[:, :end_pos, :]
        tc_first = time_context.reshape(b, num_frames, end_pos, -1)[:, 0]
        time_context = jnp.broadcast_to(
            tc_first[:, None], (b, num_frames, end_pos, tc_first.shape[-1])
        ).reshape(b * num_frames, end_pos, tc_first.shape[-1])

        residual = x
        h = GroupNorm(num_groups=32, eps=1e-6, name="norm")(x)
        h = h.reshape(n, s, c_in)
        h = make_dense(inner, dtype=self.dtype, name="proj_in",
                       quant=self.quant)(h)

        # frame-index positional embedding (reference unet.py:666-677)
        frame_ids = jnp.tile(jnp.arange(num_frames, dtype=jnp.float32), (b,))
        t_emb = sinusoidal_embedding(frame_ids, c_in).astype(h.dtype)
        emb = TimestepEmbedding(c_in * 4, out_dim=c_in, dtype=self.dtype,
                                name="time_pos_embed")(t_emb)
        emb = emb[:, None, :]

        # one blender shared by all layers (reference unet.py:614,693);
        # only its sigmoid scalar is needed — the blend itself happens in
        # the temporal layout inside the block (identical math)
        alpha = AlphaScalar(0.5, name="time_mixer")()
        spatial_cls = (nn.remat(BasicTransformerBlock, prevent_cse=False)
                       if self.remat else BasicTransformerBlock)
        temporal_cls = (nn.remat(TemporalBasicTransformerBlock, prevent_cse=False)
                        if self.remat else TemporalBasicTransformerBlock)
        for i in range(self.num_layers):
            h = spatial_cls(
                self.heads, self.dim_head, num_id_tokens=self.num_id_tokens,
                use_flash=self.use_flash, quant=self.quant, dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, context)
            # the reference computes (h + emb) before the temporal block
            # (unet.py:686); the add happens inside, post-transpose —
            # identical math, better fusion
            h = temporal_cls(
                self.heads, self.dim_head, num_frames, quant=self.quant,
                dtype=self.dtype,
                name=f"temporal_transformer_blocks_{i}",
            )(h, time_context, emb, alpha)

        h = make_dense(c_in, dtype=self.dtype, name="proj_out",
                       quant=self.quant)(h)
        h = h.reshape(n, hh, ww, c_in)
        return h + residual
