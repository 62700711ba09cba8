"""End-to-end numerical parity: torch oracle -> weight converter -> Flax.

Each test builds a tiny torch oracle (diffusers-compatible naming), converts
its state dict with convert/torch_to_jax.py, runs both on the same input,
and compares outputs. This validates module math, parameter naming, and
layout transposes in one shot.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stableanimator_tpu.core.config import (
    CLIPVisionConfig,
    FaceEncoderConfig,
    PoseNetConfig,
    UNetConfig,
    VAEConfig,
)
from stableanimator_tpu.convert import (
    convert_clip_vision,
    convert_face_encoder,
    convert_pose_net,
    convert_unet,
    convert_vae,
)
from stableanimator_tpu.convert.torch_to_jax import init_id_adapter_from_svd
from stableanimator_tpu.models import (
    AutoencoderKLTemporalDecoder,
    CLIPVisionModelWithProjection,
    FusionFaceId,
    PoseNet,
    UNetSpatioTemporal,
)
from tests import torch_oracles as oracle

# compile-heavy (full pipeline graphs on XLA:CPU); excluded from the smoke tier
pytestmark = pytest.mark.slow


def _nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _tree_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _tree_paths(v, prefix + (k,))
        else:
            out.add(prefix + (k,))
    return out


def _assert_same_structure(converted, initialized):
    got = _tree_paths(converted)
    want = _tree_paths(initialized)
    assert got == want, (
        f"param tree mismatch:\n  missing: {sorted(want - got)[:8]}\n"
        f"  extra:   {sorted(got - want)[:8]}"
    )


@pytest.fixture(scope="module")
def rng():
    torch.manual_seed(0)
    return np.random.default_rng(0)


class TestPoseNet:
    def test_parity(self, rng):
        cfg = PoseNetConfig.tiny()
        torch_model = oracle.PoseNetOracle(cfg).eval()
        params = convert_pose_net(oracle.state_dict_numpy(torch_model))

        model = PoseNet(cfg)
        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        init = model.init(jax.random.PRNGKey(0), jnp.asarray(_nchw_to_nhwc(x)))
        _assert_same_structure(params["params"], init["params"])

        out = model.apply(params, jnp.asarray(_nchw_to_nhwc(x)))
        with torch.no_grad():
            ref = torch_model(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(np.asarray(out), _nchw_to_nhwc(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_zero_init_is_noop(self):
        cfg = PoseNetConfig.tiny()
        model = PoseNet(cfg)
        x = jnp.ones((1, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert float(jnp.abs(out).max()) == 0.0


class TestFaceEncoder:
    def test_parity(self, rng):
        cfg = FaceEncoderConfig.tiny()
        torch_model = oracle.FusionFaceIdOracle(cfg).eval()
        params = convert_face_encoder(oracle.state_dict_numpy(torch_model))

        model = FusionFaceId(cfg)
        ide = rng.normal(size=(2, cfg.id_embeddings_dim)).astype(np.float32)
        clip = rng.normal(size=(2, 1, cfg.clip_embeddings_dim)).astype(np.float32)
        init = model.init(jax.random.PRNGKey(0), jnp.asarray(ide), jnp.asarray(clip))
        _assert_same_structure(params["params"], init["params"])

        out = model.apply(params, jnp.asarray(ide), jnp.asarray(clip))
        with torch.no_grad():
            ref = torch_model(torch.from_numpy(ide), torch.from_numpy(clip)).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


class TestCLIP:
    def test_parity(self, rng):
        cfg = CLIPVisionConfig.tiny()
        torch_model = oracle.CLIPVisionOracle(cfg).eval()
        params = convert_clip_vision(oracle.state_dict_numpy(torch_model))

        model = CLIPVisionModelWithProjection(cfg)
        x = rng.normal(size=(2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
        init = model.init(jax.random.PRNGKey(0), jnp.asarray(_nchw_to_nhwc(x)))
        _assert_same_structure(params["params"], init["params"])

        out = model.apply(params, jnp.asarray(_nchw_to_nhwc(x)))
        with torch.no_grad():
            ref = torch_model(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-4, atol=3e-4)


class TestVAE:
    def test_parity(self, rng):
        cfg = VAEConfig.tiny()
        torch_model = oracle.VAEOracle(cfg).eval()
        params = convert_vae(oracle.state_dict_numpy(torch_model))

        model = AutoencoderKLTemporalDecoder(cfg)
        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        xj = jnp.asarray(_nchw_to_nhwc(x))
        init = model.init(jax.random.PRNGKey(0), xj, num_frames=2)
        _assert_same_structure(params["params"], init["params"])

        # encode parity
        moments = model.apply(params, xj, method=model.encode)
        with torch.no_grad():
            ref_m = torch_model.encode(torch.from_numpy(x)).numpy()
        ref_mean, ref_logvar = np.split(_nchw_to_nhwc(ref_m), 2, axis=-1)
        np.testing.assert_allclose(np.asarray(moments.mean), ref_mean,
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(moments.logvar),
                                   np.clip(ref_logvar, -30, 20),
                                   rtol=2e-4, atol=2e-4)

        # decode parity (frame axis live through the temporal decoder)
        z = rng.normal(size=(4, cfg.latent_channels, 4, 4)).astype(np.float32)
        out = model.apply(params, jnp.asarray(_nchw_to_nhwc(z)), num_frames=4,
                          method=model.decode)
        with torch.no_grad():
            ref = torch_model.decode(torch.from_numpy(z), num_frames=4).numpy()
        np.testing.assert_allclose(np.asarray(out), _nchw_to_nhwc(ref),
                                   rtol=3e-4, atol=3e-4)


class TestUNet:
    def test_parity(self, rng):
        cfg = UNetConfig.tiny()
        torch_model = oracle.UNetOracle(cfg).eval()
        params = convert_unet(oracle.state_dict_numpy(torch_model))

        model = UNetSpatioTemporal(cfg)
        b, f, h, w = 1, 2, 16, 16
        sample = rng.normal(size=(b, f, cfg.in_channels, h, w)).astype(np.float32)
        context = rng.normal(size=(b, 1 + cfg.num_id_tokens,
                                   cfg.cross_attention_dim)).astype(np.float32)
        add_ids = np.array([[6.0, 127.0, 0.02]], dtype=np.float32)
        t = np.float32(1.6377)
        pose = rng.normal(size=(b * f, cfg.block_out_channels[0], h, w)).astype(np.float32)

        sample_j = jnp.asarray(np.transpose(sample, (0, 1, 3, 4, 2)))
        pose_j = jnp.asarray(_nchw_to_nhwc(pose))
        init = model.init(jax.random.PRNGKey(0), sample_j, t,
                          jnp.asarray(context), jnp.asarray(add_ids), pose_j)
        _assert_same_structure(params["params"], init["params"])

        out = model.apply(params, sample_j, t, jnp.asarray(context),
                          jnp.asarray(add_ids), pose_j)
        with torch.no_grad():
            ref = torch_model(torch.from_numpy(sample), torch.tensor(t),
                              torch.from_numpy(context), torch.from_numpy(add_ids),
                              torch.from_numpy(pose)).numpy()
        np.testing.assert_allclose(np.asarray(out),
                                   np.transpose(ref, (0, 1, 3, 4, 2)),
                                   rtol=2e-3, atol=2e-3)

    def test_cfg_batching_equals_two_calls(self, rng):
        """One batched call with zero context/pose for the uncond stream must
        equal the reference's two sequential calls
        (inference_pipeline_animation.py:663-685)."""
        cfg = UNetConfig.tiny()
        model = UNetSpatioTemporal(cfg)
        b, f, h, w = 1, 2, 8, 8
        rng_np = np.random.default_rng(3)
        sample = jnp.asarray(rng_np.normal(size=(b, f, h, w, cfg.in_channels)),
                             jnp.float32)
        ctx = jnp.asarray(rng_np.normal(size=(b, 5, cfg.cross_attention_dim)),
                          jnp.float32)
        add_ids = jnp.asarray([[6.0, 127.0, 0.02]], dtype=jnp.float32)
        pose = jnp.asarray(rng_np.normal(size=(b * f, h, w, cfg.block_out_channels[0])),
                           jnp.float32)
        t = jnp.float32(0.5)
        params = model.init(jax.random.PRNGKey(1), sample, t, ctx, add_ids, pose)

        uncond = model.apply(params, sample, t, jnp.zeros_like(ctx), add_ids, None)
        cond = model.apply(params, sample, t, ctx, add_ids, pose)

        batched = model.apply(
            params,
            jnp.concatenate([sample, sample]),
            t,
            jnp.concatenate([jnp.zeros_like(ctx), ctx]),
            jnp.concatenate([add_ids, add_ids]),
            jnp.concatenate([jnp.zeros_like(pose), pose]),
        )
        # identical math on different batch shapes: XLA schedules fp32
        # reductions differently for b=2 vs b=1, ~1e-4 after a full UNet
        # (a semantic CFG-batching bug would be O(0.1+))
        np.testing.assert_allclose(np.asarray(batched[:1]), np.asarray(uncond),
                                   rtol=5e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(batched[1:]), np.asarray(cond),
                                   rtol=5e-4, atol=5e-4)

    def test_init_id_adapter_from_svd(self, rng):
        cfg = UNetConfig.tiny()
        torch_model = oracle.UNetOracle(cfg)
        sd = oracle.state_dict_numpy(torch_model)
        # simulate a vanilla SVD checkpoint: drop the id-adapter weights
        sd_svd = {k: v for k, v in sd.items() if "processor" not in k}
        params = init_id_adapter_from_svd(convert_unet(sd_svd))
        full = convert_unet(sd)
        _assert_same_structure(params["params"], full["params"])
