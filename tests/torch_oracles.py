"""Compact torch oracles for parity tests.

Fresh implementations (NCHW, torch) of the standard SVD/StableAnimator
blocks, with diffusers-compatible parameter naming so that
`stableanimator_tpu.convert.torch_to_jax` maps their state dicts onto the
Flax modules. Used ONLY by tests — the framework never imports torch.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------------
# primitive blocks
# --------------------------------------------------------------------------

class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch=None, eps=1e-6):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch is not None:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        else:
            self.time_emb_proj = None
        self.norm2 = nn.GroupNorm(32, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if self.time_emb_proj is not None and temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TemporalResnetBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch=None, eps=1e-6):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, in_ch, eps=eps)
        self.conv1 = nn.Conv3d(in_ch, out_ch, (3, 1, 1), padding=(1, 0, 0))
        if temb_ch is not None:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        else:
            self.time_emb_proj = None
        self.norm2 = nn.GroupNorm(32, out_ch, eps=eps)
        self.conv2 = nn.Conv3d(out_ch, out_ch, (3, 1, 1), padding=(1, 0, 0))
        self.conv_shortcut = nn.Conv3d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x, temb=None):
        # x: [B, C, F, H, W]; temb: [B, F, E]
        h = self.conv1(F.silu(self.norm1(x)))
        if self.time_emb_proj is not None and temb is not None:
            t = self.time_emb_proj(F.silu(temb))[:, :, :, None, None]
            h = h + t.permute(0, 2, 1, 3, 4)
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class AlphaBlender(nn.Module):
    def __init__(self, alpha, reverse=False):
        super().__init__()
        self.mix_factor = nn.Parameter(torch.tensor([alpha]))
        self.reverse = reverse

    def forward(self, x_spatial, x_temporal):
        a = torch.sigmoid(self.mix_factor)
        if self.reverse:
            a = 1.0 - a
        return a * x_spatial + (1.0 - a) * x_temporal


class SpatioTemporalResBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch=None, eps=1e-6,
                 temporal_eps=None, merge_factor=0.5, reverse=False):
        super().__init__()
        self.spatial_res_block = ResnetBlock2D(in_ch, out_ch, temb_ch, eps)
        self.temporal_res_block = TemporalResnetBlock(
            out_ch, out_ch, temb_ch, temporal_eps if temporal_eps else eps)
        self.time_mixer = AlphaBlender(merge_factor, reverse)

    def forward(self, x, temb=None, num_frames=1):
        h = self.spatial_res_block(x, temb)
        bf, c, hh, ww = h.shape
        b = bf // num_frames
        h_v = h.reshape(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)
        temb_v = temb.reshape(b, num_frames, -1) if temb is not None else None
        h_t = self.temporal_res_block(h_v, temb_v)
        out = self.time_mixer(h_v, h_t)
        return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


class GEGLUFF(nn.Module):
    """diffusers FeedForward: net = [GEGLU(proj), Dropout, Linear]."""

    def __init__(self, dim, dim_out=None, mult=4):
        super().__init__()
        inner = int(dim * mult)
        dim_out = dim_out or dim

        class GEGLU(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(dim, inner * 2)

            def forward(self, x):
                a, g = self.proj(x).chunk(2, dim=-1)
                return a * F.gelu(g)

        self.net = nn.ModuleList([GEGLU(), nn.Dropout(0.0), nn.Linear(inner, dim_out)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class Attention(nn.Module):
    def __init__(self, query_dim, cross_dim=None, heads=4, dim_head=16,
                 id_adapter=False):
        super().__init__()
        inner = heads * dim_head
        cross_dim = cross_dim if cross_dim is not None else query_dim
        self.heads = heads
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(cross_dim, inner, bias=False)
        self.to_v = nn.Linear(cross_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim), nn.Dropout(0.0)])
        if id_adapter:
            class Processor(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.id_to_k = nn.Linear(cross_dim, inner, bias=False)
                    self.id_to_v = nn.Linear(cross_dim, inner, bias=False)

            self.processor = Processor()
        else:
            self.processor = None

    def _mh(self, t):
        b, s, d = t.shape
        return t.reshape(b, s, self.heads, d // self.heads).transpose(1, 2)

    def _attend(self, q, k, v):
        o = F.scaled_dot_product_attention(self._mh(q), self._mh(k), self._mh(v))
        b, h, s, d = o.shape
        return o.transpose(1, 2).reshape(b, s, h * d)

    def forward(self, x, context=None, num_id_tokens=4):
        if self.processor is None:
            ctx = x if context is None else context
            o = self._attend(self.to_q(x), self.to_k(ctx), self.to_v(ctx))
        else:
            end = context.shape[1] - num_id_tokens
            base_ctx, id_ctx = context[:, :end], context[:, end:]
            q = self.to_q(x)
            base = self._attend(q, self.to_k(base_ctx), self.to_v(base_ctx))
            ident = self._attend(q, self.processor.id_to_k(id_ctx),
                                 self.processor.id_to_v(id_ctx))
            mean_b = base.mean(dim=(1, 2), keepdim=True)
            std_b = base.std(dim=(1, 2), keepdim=True)
            mean_i = ident.mean(dim=(1, 2), keepdim=True)
            std_i = ident.std(dim=(1, 2), keepdim=True)
            ident = (ident - mean_i) * (std_b / (std_i + 1e-5)) + mean_b
            o = base + ident
        return self.to_out[0](o)


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, cross_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = Attention(dim, None, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.attn2 = Attention(dim, cross_dim, heads, dim_head, id_adapter=True)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = GEGLUFF(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class TemporalBasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, cross_dim):
        super().__init__()
        self.norm_in = nn.LayerNorm(dim)
        self.ff_in = GEGLUFF(dim, dim_out=dim)
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, None, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, cross_dim, heads, dim_head)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = GEGLUFF(dim)

    def forward(self, x, time_context, num_frames):
        bf, s, c = x.shape
        b = bf // num_frames
        h = x.reshape(b, num_frames, s, c).permute(0, 2, 1, 3).reshape(b * s, num_frames, c)
        h = h + self.ff_in(self.norm_in(h))
        h = h + self.attn1(self.norm1(h))
        h = h + self.attn2(self.norm2(h), time_context)
        h = h + self.ff(self.norm3(h))
        return h.reshape(b, s, num_frames, c).permute(0, 2, 1, 3).reshape(bf, s, c)


def timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(-math.log(max_period) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, dim, out_dim=None):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, out_dim or dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TransformerSpatioTemporalModel(nn.Module):
    def __init__(self, heads, dim_head, in_ch, cross_dim, num_layers=1):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(32, in_ch, eps=1e-6)
        self.proj_in = nn.Linear(in_ch, inner)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(inner, heads, dim_head, cross_dim)
             for _ in range(num_layers)])
        self.temporal_transformer_blocks = nn.ModuleList(
            [TemporalBasicTransformerBlock(inner, heads, dim_head, cross_dim)
             for _ in range(num_layers)])
        self.time_pos_embed = TimestepEmbedding(in_ch, in_ch * 4, out_dim=in_ch)
        self.time_mixer = AlphaBlender(0.5)
        self.proj_out = nn.Linear(inner, in_ch)
        self.in_ch = in_ch

    def forward(self, x, context, num_frames, num_id_tokens=4):
        bf, c, hh, ww = x.shape
        b = bf // num_frames
        end = context.shape[1] - num_id_tokens
        time_ctx = context[:, :end, :]
        tc_first = time_ctx.reshape(b, num_frames, -1, time_ctx.shape[-1])[:, 0]
        time_ctx = tc_first[:, None].broadcast_to(
            b, hh * ww, tc_first.shape[-2], tc_first.shape[-1]
        ).reshape(b * hh * ww, -1, tc_first.shape[-1])

        residual = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(bf, hh * ww, c)
        h = self.proj_in(h)

        frame_ids = torch.arange(num_frames).repeat(b)
        emb = self.time_pos_embed(timestep_embedding(frame_ids, self.in_ch))[:, None]

        for blk, tblk in zip(self.transformer_blocks, self.temporal_transformer_blocks):
            h = blk(h, context)
            h_mix = tblk(h + emb, time_ctx, num_frames)
            h = self.time_mixer(h, h_mix)

        h = self.proj_out(h)
        h = h.reshape(bf, hh, ww, h.shape[-1]).permute(0, 3, 1, 2)
        return h + residual


class Downsample2D(nn.Module):
    def __init__(self, ch, asymmetric=False):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0 if asymmetric else 1)
        self.asymmetric = asymmetric

    def forward(self, x):
        if self.asymmetric:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


# --------------------------------------------------------------------------
# full tiny UNet
# --------------------------------------------------------------------------

class UNetOracle(nn.Module):
    """Tiny UNetSpatioTemporalConditionModel matching UNetConfig.tiny()."""

    def __init__(self, cfg):
        super().__init__()
        ch = cfg.block_out_channels
        heads = cfg.num_attention_heads
        cross = cfg.cross_attention_dim
        temb = ch[0] * 4
        self.cfg = cfg
        self.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = TimestepEmbedding(ch[0], temb)
        self.add_embedding = TimestepEmbedding(
            cfg.projection_class_embeddings_input_dim, temb)

        def make_cross_down(in_ch, out_ch, nheads, last):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                SpatioTemporalResBlock(in_ch if i == 0 else out_ch, out_ch, temb, eps=1e-6)
                for i in range(2)])
            blk.attentions = nn.ModuleList([
                TransformerSpatioTemporalModel(nheads, out_ch // nheads, out_ch, cross)
                for _ in range(2)])
            blk.downsamplers = None if last else nn.ModuleList([Downsample2D(out_ch)])
            return blk

        def make_down(in_ch, out_ch):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                SpatioTemporalResBlock(in_ch if i == 0 else out_ch, out_ch, temb, eps=1e-5)
                for i in range(2)])
            blk.downsamplers = None
            return blk

        self.down_blocks = nn.ModuleList()
        in_ch = ch[0]
        for i, bt in enumerate(cfg.down_block_types):
            out_ch = ch[i]
            if bt == "CrossAttnDownBlockSpatioTemporal":
                self.down_blocks.append(
                    make_cross_down(in_ch, out_ch, heads[i], i == len(ch) - 1))
            else:
                self.down_blocks.append(make_down(in_ch, out_ch))
            in_ch = out_ch

        mid = nn.Module()
        mid.resnets = nn.ModuleList([
            SpatioTemporalResBlock(ch[-1], ch[-1], temb, eps=1e-5) for _ in range(2)])
        mid.attentions = nn.ModuleList([
            TransformerSpatioTemporalModel(heads[-1], ch[-1] // heads[-1], ch[-1], cross)])
        self.mid_block = mid

        rev_ch = list(reversed(ch))
        rev_heads = list(reversed(heads))
        self.up_blocks = nn.ModuleList()
        prev = rev_ch[0]
        for i, bt in enumerate(cfg.up_block_types):
            out_ch = rev_ch[i]
            in_skip = rev_ch[min(i + 1, len(ch) - 1)]
            blk = nn.Module()
            resnets, attns = [], []
            for j in range(3):
                skip_ch = in_skip if j == 2 else out_ch
                res_in = prev if j == 0 else out_ch
                resnets.append(SpatioTemporalResBlock(res_in + skip_ch, out_ch, temb, eps=1e-6))
                if bt == "CrossAttnUpBlockSpatioTemporal":
                    attns.append(TransformerSpatioTemporalModel(
                        rev_heads[i], out_ch // rev_heads[i], out_ch, cross))
            blk.resnets = nn.ModuleList(resnets)
            blk.attentions = nn.ModuleList(attns) if attns else None
            blk.upsamplers = (nn.ModuleList([Upsample2D(out_ch)])
                              if i < len(ch) - 1 else None)
            self.up_blocks.append(blk)
            prev = out_ch

        self.conv_norm_out = nn.GroupNorm(32, ch[0], eps=1e-5)
        self.conv_out = nn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, timestep, context, added_time_ids, pose_latents=None):
        # sample: [B, F, C, H, W]
        cfg = self.cfg
        b, f = sample.shape[:2]
        ts = timestep.expand(b)
        emb = self.time_embedding(timestep_embedding(ts, cfg.block_out_channels[0]))
        add_emb = timestep_embedding(added_time_ids.flatten(),
                                     cfg.addition_time_embed_dim).reshape(b, -1)
        emb = emb + self.add_embedding(add_emb)

        x = sample.flatten(0, 1)
        emb = emb.repeat_interleave(f, dim=0)
        context = context.repeat_interleave(f, dim=0)

        x = self.conv_in(x)
        if pose_latents is not None:
            x = x + pose_latents

        skips = [x]
        for blk in self.down_blocks:
            if getattr(blk, "attentions", None) is not None:
                for res, attn in zip(blk.resnets, blk.attentions):
                    x = res(x, emb, f)
                    x = attn(x, context, f)
                    skips.append(x)
            else:
                for res in blk.resnets:
                    x = res(x, emb, f)
                    skips.append(x)
            if blk.downsamplers is not None:
                x = blk.downsamplers[0](x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, emb, f)
        x = self.mid_block.attentions[0](x, context, f)
        x = self.mid_block.resnets[1](x, emb, f)

        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = res(x, emb, f)
                if blk.attentions is not None:
                    x = blk.attentions[j](x, context, f)
            if blk.upsamplers is not None:
                x = blk.upsamplers[0](x)

        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        return x.reshape(b, f, *x.shape[1:])


# --------------------------------------------------------------------------
# tiny VAE
# --------------------------------------------------------------------------

class VAEAttentionOracle(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch), nn.Dropout(0.0)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        t = x.view(b, c, h * w).transpose(1, 2)
        t = self.group_norm(t.transpose(1, 2)).transpose(1, 2)
        q, k, v = self.to_q(t), self.to_k(t), self.to_v(t)
        o = F.scaled_dot_product_attention(
            q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1)).squeeze(1)
        o = self.to_out[0](o)
        return o.transpose(1, 2).reshape(b, c, h, w) + res


class VAEOracle(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        ch = cfg.block_out_channels
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        in_ch = ch[0]
        for i, out_ch in enumerate(ch):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, None, eps=1e-6)
                for j in range(cfg.layers_per_block)])
            blk.downsamplers = (nn.ModuleList([Downsample2D(out_ch, asymmetric=True)])
                                if i < len(ch) - 1 else None)
            enc.down_blocks.append(blk)
            in_ch = out_ch
        mid = nn.Module()
        mid.resnets = nn.ModuleList([ResnetBlock2D(ch[-1], ch[-1], None, 1e-6)
                                     for _ in range(2)])
        mid.attentions = nn.ModuleList([VAEAttentionOracle(ch[-1])])
        enc.mid_block = mid
        enc.conv_norm_out = nn.GroupNorm(32, ch[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(ch[-1], 2 * cfg.latent_channels, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(cfg.latent_channels, ch[-1], 3, padding=1)
        dmid = nn.Module()
        dmid.resnets = nn.ModuleList([
            SpatioTemporalResBlock(ch[-1], ch[-1], None, eps=1e-6,
                                   temporal_eps=1e-5, merge_factor=0.0, reverse=True)
            for _ in range(2)])
        dmid.attentions = nn.ModuleList([VAEAttentionOracle(ch[-1])])
        dec.mid_block = dmid
        rev = list(reversed(ch))
        dec.up_blocks = nn.ModuleList()
        prev = rev[0]
        for i, out_ch in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                SpatioTemporalResBlock(prev if j == 0 else out_ch, out_ch, None,
                                       eps=1e-6, temporal_eps=1e-5,
                                       merge_factor=0.0, reverse=True)
                for j in range(cfg.layers_per_block + 1)])
            blk.upsamplers = (nn.ModuleList([Upsample2D(out_ch)])
                              if i < len(rev) - 1 else None)
            dec.up_blocks.append(blk)
            prev = out_ch
        dec.conv_norm_out = nn.GroupNorm(32, ch[0], eps=1e-6)
        dec.conv_out = nn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)
        dec.time_conv_out = nn.Conv3d(cfg.out_channels, cfg.out_channels,
                                      (3, 1, 1), padding=(1, 0, 0))
        self.decoder = dec

    def encode(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if blk.downsamplers is not None:
                h = blk.downsamplers[0](h)
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z, num_frames):
        d = self.decoder
        h = d.conv_in(z)
        h = d.mid_block.resnets[0](h, None, num_frames)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h, None, num_frames)
        for blk in d.up_blocks:
            for r in blk.resnets:
                h = r(h, None, num_frames)
            if blk.upsamplers is not None:
                h = blk.upsamplers[0](h)
        h = d.conv_out(F.silu(d.conv_norm_out(h)))
        bf, c, hh, ww = h.shape
        b = bf // num_frames
        hv = h.reshape(b, num_frames, c, hh, ww).permute(0, 2, 1, 3, 4)
        hv = d.time_conv_out(hv)
        return hv.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


# --------------------------------------------------------------------------
# PoseNet / FusionFaceId / CLIP oracles
# --------------------------------------------------------------------------

class PoseNetOracle(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg.conv_channels
        self.conv_layers = nn.Sequential(
            nn.Conv2d(c[0], c[0], 3, padding=1), nn.SiLU(),
            nn.Conv2d(c[0], c[1], 4, stride=2, padding=1), nn.SiLU(),
            nn.Conv2d(c[1], c[1], 3, padding=1), nn.SiLU(),
            nn.Conv2d(c[1], c[2], 4, stride=2, padding=1), nn.SiLU(),
            nn.Conv2d(c[2], c[2], 3, padding=1), nn.SiLU(),
            nn.Conv2d(c[2], c[3], 4, stride=2, padding=1), nn.SiLU(),
            nn.Conv2d(c[3], c[3], 3, padding=1), nn.SiLU(),
            nn.Conv2d(c[3], c[4], 3, padding=1), nn.SiLU(),
        )
        self.final_proj = nn.Conv2d(c[4], cfg.noise_latent_channels, 1)
        self.scale = nn.Parameter(torch.ones(1) * cfg.scale_init)

    def forward(self, x):
        return self.final_proj(self.conv_layers(x)) * self.scale


class FusionFaceIdOracle(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.proj = nn.Sequential(
            nn.Linear(cfg.id_embeddings_dim, cfg.id_embeddings_dim * 2),
            nn.GELU(),
            nn.Linear(cfg.id_embeddings_dim * 2,
                      cfg.cross_attention_dim * cfg.num_tokens),
        )
        self.norm = nn.LayerNorm(cfg.cross_attention_dim)

        class PerceiverAttention(nn.Module):
            def __init__(s):
                super().__init__()
                inner = cfg.heads * cfg.dim_head
                s.norm1 = nn.LayerNorm(cfg.cross_attention_dim)
                s.norm2 = nn.LayerNorm(cfg.cross_attention_dim)
                s.to_q = nn.Linear(cfg.cross_attention_dim, inner, bias=False)
                s.to_kv = nn.Linear(cfg.cross_attention_dim, inner * 2, bias=False)
                s.to_out = nn.Linear(inner, cfg.cross_attention_dim, bias=False)

            def forward(s, x, latents):
                x, latents = s.norm1(x), s.norm2(latents)
                b, l, _ = latents.shape
                q = s.to_q(latents)
                kv = s.to_kv(torch.cat([x, latents], dim=-2))
                k, v = kv.chunk(2, dim=-1)

                def mh(t):
                    return t.view(b, t.shape[1], cfg.heads, -1).transpose(1, 2)

                q, k, v = mh(q), mh(k), mh(v)
                scale = 1 / math.sqrt(math.sqrt(cfg.dim_head))
                w = (q * scale) @ (k * scale).transpose(-2, -1)
                w = torch.softmax(w.float(), dim=-1).type(w.dtype)
                o = (w @ v).permute(0, 2, 1, 3).reshape(b, l, -1)
                return s.to_out(o)

        def ff():
            return nn.Sequential(
                nn.LayerNorm(cfg.cross_attention_dim),
                nn.Linear(cfg.cross_attention_dim,
                          cfg.cross_attention_dim * cfg.ff_mult, bias=False),
                nn.GELU(),
                nn.Linear(cfg.cross_attention_dim * cfg.ff_mult,
                          cfg.cross_attention_dim, bias=False),
            )

        fusion = nn.Module()
        fusion.proj_in = nn.Linear(cfg.clip_embeddings_dim, cfg.cross_attention_dim)
        fusion.proj_out = nn.Linear(cfg.cross_attention_dim, cfg.cross_attention_dim)
        fusion.norm_out = nn.LayerNorm(cfg.cross_attention_dim)
        fusion.layers = nn.ModuleList(
            [nn.ModuleList([PerceiverAttention(), ff()]) for _ in range(cfg.depth)])
        self.fusion_model = fusion

    def forward(self, id_embeds, clip_embeds):
        cfg = self.cfg
        x = self.proj(id_embeds).reshape(-1, cfg.num_tokens, cfg.cross_attention_dim)
        latents = self.norm(x)
        f = self.fusion_model
        ctx = f.proj_in(clip_embeds)
        for attn, ffn in f.layers:
            latents = attn(ctx, latents) + latents
            latents = ffn(latents) + latents
        return f.norm_out(f.proj_out(latents))


class CLIPVisionOracle(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        d = cfg.hidden_size
        vm = nn.Module()
        emb = nn.Module()
        emb.class_embedding = nn.Parameter(torch.randn(d) * 0.02)
        emb.patch_embedding = nn.Conv2d(3, d, cfg.patch_size, stride=cfg.patch_size,
                                        bias=False)
        num_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        emb.position_embedding = nn.Embedding(num_pos, d)
        vm.embeddings = emb
        vm.pre_layrnorm = nn.LayerNorm(d, eps=cfg.layer_norm_eps)

        def layer():
            l = nn.Module()
            sa = nn.Module()
            sa.q_proj = nn.Linear(d, d)
            sa.k_proj = nn.Linear(d, d)
            sa.v_proj = nn.Linear(d, d)
            sa.out_proj = nn.Linear(d, d)
            l.self_attn = sa
            l.layer_norm1 = nn.LayerNorm(d, eps=cfg.layer_norm_eps)
            l.layer_norm2 = nn.LayerNorm(d, eps=cfg.layer_norm_eps)
            mlp = nn.Module()
            mlp.fc1 = nn.Linear(d, cfg.intermediate_size)
            mlp.fc2 = nn.Linear(cfg.intermediate_size, d)
            l.mlp = mlp
            return l

        enc = nn.Module()
        enc.layers = nn.ModuleList([layer() for _ in range(cfg.num_layers)])
        vm.encoder = enc
        vm.post_layernorm = nn.LayerNorm(d, eps=cfg.layer_norm_eps)
        self.vision_model = vm
        self.visual_projection = nn.Linear(d, cfg.projection_dim, bias=False)

    def forward(self, pixel_values):
        cfg = self.cfg
        vm = self.vision_model
        b = pixel_values.shape[0]
        p = vm.embeddings.patch_embedding(pixel_values)
        p = p.flatten(2).transpose(1, 2)
        cls = vm.embeddings.class_embedding.expand(b, 1, -1)
        x = torch.cat([cls, p], dim=1)
        x = x + vm.embeddings.position_embedding.weight[None]
        x = vm.pre_layrnorm(x)
        heads = cfg.num_heads
        for l in enc_layers(vm):
            h = l.layer_norm1(x)
            bq, s, d = h.shape

            def mh(t):
                return t.view(bq, s, heads, d // heads).transpose(1, 2)

            att = F.scaled_dot_product_attention(
                mh(l.self_attn.q_proj(h)), mh(l.self_attn.k_proj(h)),
                mh(l.self_attn.v_proj(h)))
            att = att.transpose(1, 2).reshape(bq, s, d)
            x = x + l.self_attn.out_proj(att)
            h = l.layer_norm2(x)
            x = x + l.mlp.fc2(F.gelu(l.mlp.fc1(h)))
        pooled = vm.post_layernorm(x[:, 0])
        return self.visual_projection(pooled)


def enc_layers(vm):
    return vm.encoder.layers


def state_dict_numpy(module: nn.Module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}
