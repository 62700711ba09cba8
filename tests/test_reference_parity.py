"""Parity against the REAL reference modules (VERDICT round-2 item #2).

Unlike tests/test_models_parity.py (whose torch oracles are self-authored
re-implementations — a shared misreading would pass), these tests import the
actual reference code from /root/reference (animation/modules/*.py, with
dependency stand-ins from tests/reference_torch.py), run its real
`state_dict()` through convert/torch_to_jax.py, and assert:

  1. the converter maps the REAL checkpoint key space (the released .pth
     files load into these modules with strict=True —
     reference inference_basic.py:449-471 — so module.state_dict() IS the
     checkpoint key space, including the attention-surgery keys
     `...attn2.processor.id_to_{k,v}.weight`), and
  2. forward outputs match numerically.

Full-size key spaces (1.5B-param UNet, 97M-param VAE) are verified via
meta-device instantiation (shape-only, no weights) against
jax.eval_shape of our init.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stableanimator_tpu.core.config import (
    FaceEncoderConfig,
    PoseNetConfig,
    UNetConfig,
    VAEConfig,
)
from stableanimator_tpu.convert import (
    convert_face_encoder,
    convert_pose_net,
    convert_unet,
    convert_vae,
)
from stableanimator_tpu.models import (
    AutoencoderKLTemporalDecoder,
    FusionFaceId,
    PoseNet,
    UNetSpatioTemporal,
)
from tests import reference_torch as ref

pytestmark = pytest.mark.slow


def _nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _tree_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(getattr(v, "shape", ()))
    return out


def _assert_same_structure_and_shapes(converted, initialized):
    got = _tree_paths(converted)
    want = _tree_paths(initialized)
    assert set(got) == set(want), (
        f"param tree mismatch:\n  missing: {sorted(set(want) - set(got))[:8]}\n"
        f"  extra:   {sorted(set(got) - set(want))[:8]}"
    )
    bad = [(p, got[p], want[p]) for p in want if got[p] != want[p]]
    assert not bad, f"shape mismatches: {bad[:8]}"


@pytest.fixture(scope="module")
def rng():
    torch.manual_seed(0)
    return np.random.default_rng(0)


class TestPoseNetReal:
    def test_forward_parity_full_size(self, rng):
        mod = ref.load_reference_module("pose_net")
        torch_model = mod.PoseNet(noise_latent_channels=320).eval()
        params = convert_pose_net(ref.state_dict_numpy(torch_model))

        cfg = PoseNetConfig()  # full size
        model = PoseNet(cfg)
        x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
        init = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.asarray(_nchw_to_nhwc(x))))
        _assert_same_structure_and_shapes(params["params"], init["params"])

        out = model.apply(params, jnp.asarray(_nchw_to_nhwc(x)))
        with torch.no_grad():
            want = torch_model(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(np.asarray(out), _nchw_to_nhwc(want),
                                   rtol=1e-4, atol=1e-4)


class TestFaceEncoderReal:
    def test_forward_parity_full_size(self, rng):
        mod = ref.load_reference_module("id_encoder")
        torch_model = mod.FusionFaceId(
            cross_attention_dim=1024, id_embeddings_dim=512,
            clip_embeddings_dim=1024, num_tokens=4).eval()
        params = convert_face_encoder(ref.state_dict_numpy(torch_model))

        cfg = FaceEncoderConfig()  # full size
        model = FusionFaceId(cfg)
        ide = rng.normal(size=(2, 512)).astype(np.float32)
        clip = rng.normal(size=(2, 1, 1024)).astype(np.float32)
        init = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(ide),
                               jnp.asarray(clip)))
        _assert_same_structure_and_shapes(params["params"], init["params"])

        out = model.apply(params, jnp.asarray(ide), jnp.asarray(clip))
        with torch.no_grad():
            want = torch_model(torch.from_numpy(ide),
                               torch.from_numpy(clip)).numpy()
        np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)


class TestVAEReal:
    def test_forward_parity_full_config(self, rng):
        """Real AutoencoderKLTemporalDecoder at its released config
        (reference vae.py:221-231), forward at small spatial size."""
        mod = ref.load_reference_module("vae")
        torch_model = mod.AutoencoderKLTemporalDecoder().eval()
        params = convert_vae(ref.state_dict_numpy(torch_model))

        cfg = VAEConfig()  # full config
        model = AutoencoderKLTemporalDecoder(cfg)
        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        xj = jnp.asarray(_nchw_to_nhwc(x))
        init = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), xj, num_frames=1))
        _assert_same_structure_and_shapes(params["params"], init["params"])

        moments = model.apply(params, xj, method=model.encode)
        with torch.no_grad():
            post = torch_model.encode(torch.from_numpy(x)).latent_dist
        np.testing.assert_allclose(
            np.asarray(moments.mean), _nchw_to_nhwc(post.mean.numpy()),
            rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(moments.logvar), _nchw_to_nhwc(post.logvar.numpy()),
            rtol=2e-4, atol=2e-4)

        # decode: the fork asserts num_frames == 4 (reference vae.py:275)
        z = rng.normal(size=(4, 4, 8, 8)).astype(np.float32)
        out = model.apply(params, jnp.asarray(_nchw_to_nhwc(z)), num_frames=4,
                          method=model.decode)
        with torch.no_grad():
            want = torch_model.decode(torch.from_numpy(z),
                                      num_frames=4).sample.numpy()
        np.testing.assert_allclose(np.asarray(out), _nchw_to_nhwc(want),
                                   rtol=5e-4, atol=5e-4)


def _tiny_ref_unet_kwargs():
    """Small reference-UNet instantiation. cross_attention_dim must stay
    1024: the fork hard-asserts it (reference unet.py:1102, 1228, 1925) —
    and must be a SCALAR: the ctor re-wraps it per block (unet.py:89)."""
    return dict(
        sample_size=8,
        block_out_channels=(32, 64, 64, 64),
        num_attention_heads=(2, 4, 4, 4),
        cross_attention_dim=1024,
        layers_per_block=2,
        transformer_layers_per_block=1,
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=24,
    )


def _tiny_our_unet_config():
    return UNetConfig(
        sample_size=8,
        block_out_channels=(32, 64, 64, 64),
        num_attention_heads=(2, 4, 4, 4),
        cross_attention_dim=1024,
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=24,
    )


class TestUNetReal:
    def test_forward_parity_tiny(self, rng):
        """Real reference UNet (with the real attention-processor surgery,
        inference_basic.py:348-445) vs our UNet through the converter."""
        mod = ref.load_reference_module("unet")
        torch_model = mod.UNetSpatioTemporalConditionModel(
            **_tiny_ref_unet_kwargs())
        svd_sd = ref.state_dict_numpy(torch_model)
        ref.install_reference_processors(torch_model, mod, svd_sd=svd_sd)
        torch_model = torch_model.eval()
        params = convert_unet(ref.state_dict_numpy(torch_model))

        cfg = _tiny_our_unet_config()
        model = UNetSpatioTemporal(cfg)
        b, f, h, w = 1, 2, 16, 16
        sample = rng.normal(size=(b, f, cfg.in_channels, h, w)).astype(np.float32)
        context = rng.normal(size=(b, 1 + cfg.num_id_tokens,
                                   cfg.cross_attention_dim)).astype(np.float32)
        add_ids = np.array([[6.0, 127.0, 0.02]], dtype=np.float32)
        t = np.float32(1.6377)
        pose = rng.normal(
            size=(b * f, cfg.block_out_channels[0], h, w)).astype(np.float32)

        sample_j = jnp.asarray(np.transpose(sample, (0, 1, 3, 4, 2)))
        pose_j = jnp.asarray(_nchw_to_nhwc(pose))
        init = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), sample_j, t,
                               jnp.asarray(context), jnp.asarray(add_ids),
                               pose_j))
        _assert_same_structure_and_shapes(params["params"], init["params"])

        out = model.apply(params, sample_j, t, jnp.asarray(context),
                          jnp.asarray(add_ids), pose_j)
        with torch.no_grad():
            want = torch_model(torch.from_numpy(sample), torch.tensor(t),
                               torch.from_numpy(context),
                               torch.from_numpy(add_ids),
                               torch.from_numpy(pose))[0].numpy()
        np.testing.assert_allclose(np.asarray(out),
                                   np.transpose(want, (0, 1, 3, 4, 2)),
                                   rtol=2e-3, atol=2e-3)

    def test_per_block_traced_stats_tiny(self, rng):
        """Traced-golden parity THROUGH the UNet stack, not just at the
        output: min/max/mean/std of every block boundary (conv_in, each
        down block, mid, each up block, conv_out) from the REAL reference
        UNet, compared against our intermediates captured with Flax
        capture_intermediates. This is the reference's own debug idiom
        (todos.debug.output_var dumps shape/min/max/mean, e.g.
        inference_pipeline_animation.py:598) turned into a parity gate:
        a numerics drift inside one block fails HERE at that block's name
        instead of only blurring the final-output tolerance. Stats are
        permutation-invariant, so NCHW-vs-NHWC layout needs no transposes.
        """
        mod = ref.load_reference_module("unet")
        torch_model = mod.UNetSpatioTemporalConditionModel(
            **_tiny_ref_unet_kwargs())
        svd_sd = ref.state_dict_numpy(torch_model)
        ref.install_reference_processors(torch_model, mod, svd_sd=svd_sd)
        torch_model = torch_model.eval()
        params = convert_unet(ref.state_dict_numpy(torch_model))

        cfg = _tiny_our_unet_config()
        model = UNetSpatioTemporal(cfg)
        b, f, h, w = 1, 2, 16, 16
        sample = rng.normal(size=(b, f, cfg.in_channels, h, w)).astype(np.float32)
        context = rng.normal(size=(b, 1 + cfg.num_id_tokens,
                                   cfg.cross_attention_dim)).astype(np.float32)
        add_ids = np.array([[6.0, 127.0, 0.02]], dtype=np.float32)
        t = np.float32(1.6377)
        pose = rng.normal(
            size=(b * f, cfg.block_out_channels[0], h, w)).astype(np.float32)

        n_down = len(cfg.block_out_channels)
        boundaries = (["conv_in"]
                      + [f"down_blocks_{i}" for i in range(n_down)]
                      + ["mid_block"]
                      + [f"up_blocks_{i}" for i in range(n_down)]
                      + ["conv_out"])

        def _stats(x):
            x = np.asarray(x, np.float64)
            return np.array([x.min(), x.max(), x.mean(), x.std()])

        # --- golden: forward hooks on the torch block modules -------------
        golden = {}

        def _hook(name):
            def fn(_module, _inputs, output):
                out = output[0] if isinstance(output, tuple) else output
                golden[name] = _stats(out.detach().numpy())
            return fn

        handles = []
        for name in boundaries:
            tname = name.replace("down_blocks_", "down_blocks.").replace(
                "up_blocks_", "up_blocks.")
            handles.append(
                torch_model.get_submodule(tname).register_forward_hook(
                    _hook(name)))
        with torch.no_grad():
            torch_model(torch.from_numpy(sample), torch.tensor(t),
                        torch.from_numpy(context), torch.from_numpy(add_ids),
                        torch.from_numpy(pose))
        for hd in handles:
            hd.remove()
        assert set(golden) == set(boundaries)

        # --- ours: Flax capture_intermediates at the same module names ----
        wanted = set(boundaries)
        _, state = model.apply(
            params,
            jnp.asarray(np.transpose(sample, (0, 1, 3, 4, 2))), t,
            jnp.asarray(context), jnp.asarray(add_ids),
            jnp.asarray(_nchw_to_nhwc(pose)),
            capture_intermediates=lambda m, _method: m.name in wanted,
            mutable=["intermediates"])
        inter = state["intermediates"]
        for name in boundaries:
            out = inter[name]["__call__"][0]
            if isinstance(out, tuple):
                out = out[0]
            got = _stats(np.asarray(out))
            scale = max(abs(golden[name][1]), abs(golden[name][0]), 1.0)
            np.testing.assert_allclose(
                got, golden[name], atol=2e-3 * scale,
                err_msg=f"stats diverged at block boundary {name!r} "
                        f"(got min/max/mean/std {got}, want {golden[name]})")

    def test_full_config_keyspace(self):
        """Released-config key space (1.5B params): meta-device
        instantiation + surgery, shape-only conversion, against
        jax.eval_shape of our full init. A converter drift from the real
        unet.pth key naming fails here."""
        mod = ref.load_reference_module("unet")
        with torch.device("meta"):
            # the ctor re-wraps these per block (unet.py:89-94), so they must
            # be passed as the scalars the SVD config json supplies — the
            # tuple/list defaults in the signature would fail its own asserts
            torch_model = mod.UNetSpatioTemporalConditionModel(
                cross_attention_dim=1024, layers_per_block=2,
                transformer_layers_per_block=1)
            ref.install_reference_processors(torch_model, mod, svd_sd=None)
        shapes = ref.state_dict_shapes(torch_model)
        sd = {k: np.zeros(s, np.float32) for k, s in shapes.items()}
        params = convert_unet(sd)

        cfg = UNetConfig()
        model = UNetSpatioTemporal(cfg)
        b, f, h, w = 1, 2, 8, 8
        init = jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((b, f, h, w, cfg.in_channels)),
            jnp.float32(0.0),
            jnp.zeros((b, 1 + cfg.num_id_tokens, cfg.cross_attention_dim)),
            jnp.zeros((b, 3)),
            jnp.zeros((b * f, h, w, cfg.block_out_channels[0])),
        ))
        _assert_same_structure_and_shapes(params["params"], init["params"])

    def test_vae_full_config_keyspace(self):
        mod = ref.load_reference_module("vae")
        with torch.device("meta"):
            torch_model = mod.AutoencoderKLTemporalDecoder()
        shapes = ref.state_dict_shapes(torch_model)
        sd = {k: np.zeros(s, np.float32) for k, s in shapes.items()}
        params = convert_vae(sd)

        model = AutoencoderKLTemporalDecoder(VAEConfig())
        init = jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), num_frames=1))
        _assert_same_structure_and_shapes(params["params"], init["params"])
