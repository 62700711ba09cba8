"""Numerics of the op layer against torch (CPU) oracles.

torch here is a *test oracle only* — the framework itself never imports it.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from stableanimator_tpu.ops import (
    dot_product_attention,
    gaussian_blur,
    group_norm,
    layer_norm,
    resize_bicubic_align_corners,
    upsample_nearest_2x,
)
from stableanimator_tpu.ops.attention import xla_attention
from stableanimator_tpu.ops.flash_attention import flash_attention


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


class TestNorms:
    def test_group_norm_matches_torch(self):
        x = _rand(2, 6, 5, 32)  # NHWC
        scale = _rand(32, seed=1)
        bias = _rand(32, seed=2)
        out = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                                    num_groups=8, eps=1e-5))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
        ref = F.group_norm(tx, 8, torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def test_group_norm_5d(self):
        # video tensors [N, F, H, W, C] — stats per (sample, group) over F,H,W
        x = _rand(2, 3, 4, 4, 16)
        scale, bias = np.ones(16, np.float32), np.zeros(16, np.float32)
        out = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                                    num_groups=4, eps=1e-5))
        tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # NCFHW
        ref = F.group_norm(tx, 4, eps=1e-5).permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    def test_layer_norm_matches_torch(self):
        x = _rand(3, 7, 64)
        scale = _rand(64, seed=3)
        bias = _rand(64, seed=4)
        out = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), eps=1e-5))
        ref = F.layer_norm(torch.from_numpy(x), (64,), torch.from_numpy(scale),
                           torch.from_numpy(bias), eps=1e-5).numpy()
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


class TestAttention:
    def test_xla_attention_matches_torch_sdpa(self):
        q = _rand(2, 16, 4, 8, seed=0)
        k = _rand(2, 12, 4, 8, seed=1)
        v = _rand(2, 12, 4, 8, seed=2)
        out = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        tq, tk, tv = (torch.from_numpy(t).permute(0, 2, 1, 3) for t in (q, k, v))
        ref = F.scaled_dot_product_attention(tq, tk, tv).permute(0, 2, 1, 3).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


    @pytest.mark.parametrize("sq,sk", [(256, 256), (300, 300), (128, 512)])
    def test_flash_matches_xla(self, sq, sk):
        q = jnp.asarray(_rand(1, sq, 2, 64, seed=5))
        k = jnp.asarray(_rand(1, sk, 2, 64, seed=6))
        v = jnp.asarray(_rand(1, sk, 2, 64, seed=7))
        ref = np.asarray(xla_attention(q, k, v))
        out = np.asarray(flash_attention(q, k, v, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_flash_grads_match_xla(self):
        q = jnp.asarray(_rand(1, 256, 1, 64, seed=8))
        k = jnp.asarray(_rand(1, 256, 1, 64, seed=9))
        v = jnp.asarray(_rand(1, 256, 1, 64, seed=10))

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(xla_attention(q, k, v) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for gf, gx, name in zip(g_flash, g_xla, "qkv"):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                       rtol=2e-3, atol=2e-3, err_msg=f"d{name}")

    def test_dispatcher_small_kv(self):
        # cross-attention shape: kv of 5 tokens must route through XLA
        q = jnp.asarray(_rand(2, 64, 4, 16, seed=11))
        k = jnp.asarray(_rand(2, 5, 4, 16, seed=12))
        v = jnp.asarray(_rand(2, 5, 4, 16, seed=13))
        out = dot_product_attention(q, k, v)
        assert out.shape == q.shape


class TestTemporalAttentionAt1x1:
    def test_cross_frame_mixing_survives_single_spatial_token(self):
        """At 1x1 spatial (context.shape[1] == 1) temporal SELF-attention
        must still attend across the F frames — the single-key softmax
        shortcut is only valid for true single-key attention (it silently
        dropped all cross-frame mixing here before the round-3 fix).
        Reference math: unet.py:872-958 frame-major attention."""
        from stableanimator_tpu.models.transformer import Attention

        b, f, sq, c = 2, 3, 1, 8
        heads, dim_head = 2, 4
        attn = Attention(heads, dim_head, c, use_flash=False,
                         seq_axis_group=(b, f))
        x = jnp.asarray(_rand(b * f, sq, c, seed=7))
        params = attn.init(jax.random.PRNGKey(0), x)
        out = np.asarray(attn.apply(params, x))

        # manual frame-major attention oracle
        p = params["params"]
        q = (np.asarray(x) @ np.asarray(p["to_q"]["kernel"]))
        k = (np.asarray(x) @ np.asarray(p["to_k"]["kernel"]))
        v = (np.asarray(x) @ np.asarray(p["to_v"]["kernel"]))

        def fm(t):  # [b*f, 1, heads*dim_head] -> [b, heads, f, dim_head]
            return (t.reshape(b, f, heads, dim_head)
                    .transpose(0, 2, 1, 3))

        qf, kf, vf = fm(q), fm(k), fm(v)
        logits = (qf @ kf.transpose(0, 1, 3, 2)) / np.sqrt(dim_head)
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        o = (w @ vf).transpose(0, 2, 1, 3).reshape(b * f, 1, heads * dim_head)
        want = o @ np.asarray(p["to_out"]["kernel"]) + np.asarray(
            p["to_out"]["bias"])
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)

        # and it must NOT equal the (wrong) single-key shortcut output
        shortcut = (np.asarray(x) @ np.asarray(p["to_v"]["kernel"])
                    @ np.asarray(p["to_out"]["kernel"])
                    + np.asarray(p["to_out"]["bias"]))
        assert np.abs(out - shortcut).max() > 1e-4

    def test_shortcut_still_fires_for_single_key_cross_attention(self):
        """Temporal cross-attention to one CLIP token keeps the exact
        softmax==1 shortcut (reference unet.py:640-654)."""
        from stableanimator_tpu.models.transformer import Attention

        b, f, sq, c = 1, 3, 4, 8
        attn = Attention(2, 4, c, use_flash=False, seq_axis_group=(b, f))
        x = jnp.asarray(_rand(b * f, sq, c, seed=8))
        ctx = jnp.asarray(_rand(b * f, 1, c, seed=9))
        params = attn.init(jax.random.PRNGKey(0), x, ctx)
        out = np.asarray(attn.apply(params, x, ctx))
        p = params["params"]
        want = (np.asarray(ctx) @ np.asarray(p["to_v"]["kernel"])
                @ np.asarray(p["to_out"]["kernel"])
                + np.asarray(p["to_out"]["bias"]))
        np.testing.assert_allclose(out, np.broadcast_to(want, out.shape),
                                   rtol=1e-5, atol=1e-6)


class TestResize:
    def test_bicubic_align_corners_matches_torch(self):
        x = _rand(2, 17, 23, 3)
        out = np.asarray(resize_bicubic_align_corners(jnp.asarray(x), 8, 11))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.interpolate(tx, size=(8, 11), mode="bicubic", align_corners=True)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_bicubic_upscale_matches_torch(self):
        x = _rand(1, 8, 8, 2, seed=3)
        out = np.asarray(resize_bicubic_align_corners(jnp.asarray(x), 24, 24))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.interpolate(tx, size=(24, 24), mode="bicubic", align_corners=True)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_nearest_2x(self):
        x = _rand(1, 3, 3, 2)
        out = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = F.interpolate(tx, scale_factor=2.0, mode="nearest").permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, ref)

    def test_gaussian_blur_matches_reference_impl(self):
        """Oracle: a direct torch port of the reference _gaussian_blur2d
        (reflect pad + separable conv, kornia-style)."""
        x = _rand(1, 16, 16, 3, seed=7)
        ks, sigmas = (5, 5), (1.2, 0.8)
        out = np.asarray(gaussian_blur(jnp.asarray(x), ks, sigmas))

        tx = torch.from_numpy(x).permute(0, 3, 1, 2)

        def g1d(n, s):
            xs = torch.arange(n, dtype=torch.float32) - n // 2
            if n % 2 == 0:
                xs = xs + 0.5
            g = torch.exp(-xs**2 / (2 * s**2))
            return g / g.sum()

        kx, ky = g1d(ks[1], sigmas[1]), g1d(ks[0], sigmas[0])
        c = tx.shape[1]
        pad_x = [(ks[1] - 1) // 2, (ks[1] - 1) - (ks[1] - 1) // 2]
        tmp = F.pad(tx, pad_x + [0, 0], mode="reflect")
        tmp = F.conv2d(tmp, kx.view(1, 1, 1, -1).expand(c, 1, 1, -1), groups=c)
        pad_y = [(ks[0] - 1) // 2, (ks[0] - 1) - (ks[0] - 1) // 2]
        tmp = F.pad(tmp, [0, 0] + pad_y, mode="reflect")
        ref = F.conv2d(tmp, ky.view(1, 1, -1, 1).expand(c, 1, -1, 1), groups=c)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestFlashKernelVariants:
    """Both forward kernels (streamed-KV and resident-KV) must match XLA for
    the model's head counts (odd 5, even 2/10) and unpadded lengths."""

    @pytest.mark.parametrize("h", [1, 2, 5])
    @pytest.mark.parametrize("sq,sk", [(256, 256), (300, 513)])
    def test_streamed_matches_xla(self, h, sq, sk):
        from stableanimator_tpu.ops.flash_attention import _flash_fwd_bshd

        q = jnp.asarray(_rand(2, sq, h, 64, seed=11))
        k = jnp.asarray(_rand(2, sk, h, 64, seed=12))
        v = jnp.asarray(_rand(2, sk, h, 64, seed=13))
        ref = np.asarray(xla_attention(q, k, v))
        out = np.asarray(_flash_fwd_bshd(q, k, v, 64 ** -0.5, True, False))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("h", [1, 2, 5])
    @pytest.mark.parametrize("sq,sk", [(256, 256), (300, 513)])
    def test_resident_matches_xla(self, h, sq, sk):
        from stableanimator_tpu.ops.flash_attention import _flash_fwd_resident

        q = jnp.asarray(_rand(2, sq, h, 64, seed=14))
        k = jnp.asarray(_rand(2, sk, h, 64, seed=15))
        v = jnp.asarray(_rand(2, sk, h, 64, seed=16))
        ref = np.asarray(xla_attention(q, k, v))
        out = np.asarray(_flash_fwd_resident(q, k, v, 64 ** -0.5, True, False))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_resident_lse_matches_streamed(self):
        from stableanimator_tpu.ops.flash_attention import (
            _flash_fwd_bshd, _flash_fwd_resident)

        q = jnp.asarray(_rand(1, 300, 2, 64, seed=17))
        k = jnp.asarray(_rand(1, 300, 2, 64, seed=18))
        v = jnp.asarray(_rand(1, 300, 2, 64, seed=19))
        o1, lse1 = _flash_fwd_bshd(q, k, v, 64 ** -0.5, True, True)
        o2, lse2 = _flash_fwd_resident(q, k, v, 64 ** -0.5, True, True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(lse1), np.asarray(lse2),
                                   rtol=2e-5, atol=2e-5)


class TestSubpixelUpConv:
    """Upsample2D's 4-phase decomposition must equal the naive
    nearest-2x-then-3x3-conv path (layers.py:_SubpixelUpConv)."""

    @pytest.mark.parametrize("h,w,cin,cout", [(6, 5, 8, 16), (8, 8, 16, 8)])
    def test_matches_naive_upsample_conv(self, h, w, cin, cout):
        from stableanimator_tpu.models.layers import Upsample2D

        x = jnp.asarray(_rand(2, h, w, cin, seed=3))
        sub = Upsample2D(cout, subpixel=True)
        naive = Upsample2D(cout, subpixel=False)
        params = sub.init(jax.random.PRNGKey(0), x)
        # identical param tree -> checkpoints interchangeable
        naive_params = naive.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(naive_params))
        assert [(p.shape, p.dtype) for p in jax.tree_util.tree_leaves(params)] \
            == [(p.shape, p.dtype) for p in jax.tree_util.tree_leaves(naive_params)]
        out = np.asarray(sub.apply(params, x))
        ref = np.asarray(naive.apply(params, x))
        assert out.shape == (2, 2 * h, 2 * w, cout)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_matches_naive_bf16(self):
        from stableanimator_tpu.models.layers import Upsample2D

        x = jnp.asarray(_rand(1, 6, 6, 16, seed=4), jnp.bfloat16)
        sub = Upsample2D(16, subpixel=True, dtype=jnp.bfloat16)
        naive = Upsample2D(16, subpixel=False, dtype=jnp.bfloat16)
        params = sub.init(jax.random.PRNGKey(0), x)
        out = np.asarray(sub.apply(params, x), np.float32)
        ref = np.asarray(naive.apply(params, x), np.float32)
        # taps are combined in fp32 before the bf16 cast, so rounding can
        # differ by ~1 ulp of bf16
        np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)


class TestInt8Quant:
    """W8A8 dynamic-quant dense path (ops/quant.py, layers.QuantDense)."""

    def test_int8_dense_close_to_fp32(self):
        from stableanimator_tpu.ops.quant import int8_dense

        x = jnp.asarray(_rand(64, 320, seed=5))
        w = jnp.asarray(_rand(320, 1280, seed=6) * 0.05)
        b = jnp.asarray(_rand(1280, seed=7) * 0.1)
        out = np.asarray(int8_dense(x, w, b))
        ref = np.asarray(x @ w + b)
        # per-token + per-channel int8: ~1% relative error on the matmul
        denom = np.maximum(np.abs(ref), np.percentile(np.abs(ref), 50))
        assert np.median(np.abs(out - ref) / denom) < 0.02
        assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.999

    def test_quant_dense_param_tree_matches_dense(self):
        import flax.linen as nn
        from stableanimator_tpu.models.layers import QuantDense

        x = jnp.asarray(_rand(4, 32, seed=8))
        qd = QuantDense(64)
        d = nn.Dense(64, param_dtype=jnp.float32)
        pq = qd.init(jax.random.PRNGKey(0), x)
        pd = d.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(pq)
                == jax.tree_util.tree_structure(pd))
        assert [(p.shape, str(p.dtype)) for p in jax.tree_util.tree_leaves(pq)] \
            == [(p.shape, str(p.dtype)) for p in jax.tree_util.tree_leaves(pd)]
        # same params -> close outputs
        out = np.asarray(qd.apply(pd, x))
        ref = np.asarray(d.apply(pd, x))
        assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.999

    def test_quant_unet_shares_checkpoints_and_tracks_bf16(self):
        """quant=True UNet must accept the bf16 UNet's params unchanged and
        produce outputs that track the full-precision forward."""
        from stableanimator_tpu.core.config import UNetConfig
        from stableanimator_tpu.models.unet import UNetSpatioTemporal

        cfg = UNetConfig(
            block_out_channels=(32, 64, 64, 64), num_attention_heads=(2, 4, 4, 4),
            cross_attention_dim=64, layers_per_block=1)
        b, f, hh, ww = 1, 2, 8, 8
        sample = jnp.asarray(_rand(b, f, hh, ww, cfg.in_channels, seed=9) * 0.3)
        t = jnp.float32(1.0)
        ctx = jnp.asarray(_rand(b, 5, 64, seed=10) * 0.3)
        ids = jnp.asarray([[6.0, 127.0, 0.02]], jnp.float32)
        pose = jnp.asarray(_rand(b * f, hh, ww, 32, seed=11) * 0.3)

        fp = UNetSpatioTemporal(cfg)
        qn = UNetSpatioTemporal(cfg, quant=True)
        params = fp.init(jax.random.PRNGKey(0), sample, t, ctx, ids, pose)
        ref = np.asarray(fp.apply(params, sample, t, ctx, ids, pose))
        out = np.asarray(qn.apply(params, sample, t, ctx, ids, pose))
        assert out.shape == ref.shape
        assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.99

