"""jax.export artifact tests (tools/export_model.py — SURVEY.md §2.1 #14).

Each export serialises to StableHLO bytes, deserialises in the same process
WITHOUT touching the Flax model classes, executes, and must match the live
model's output — the TPU-native analog of the reference's
project/image_animate TorchScript refactor (unet_3d.py + vae_3d.py), plus a
whole-generate export the reference never shipped.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import export as jexport

from stableanimator_tpu.pipeline import fast_init_params

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    from tests.conftest import build_micro_models

    models = build_micro_models()
    params = fast_init_params(models, height=64, width=64)
    return models, params


def _roundtrip(exported):
    blob = exported.serialize()
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0
    return jexport.deserialize(blob)


def test_unet_export_roundtrip(setup):
    from tools.export_model import export_unet

    models, params = setup
    cfg = models.unet.config
    b, f, h8, w8 = 2, 2, 8, 8
    p = {"params": params["unet"]}
    exported = export_unet(models.unet, p, b, f, h8, w8)
    reloaded = _roundtrip(exported)

    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.normal(size=(b, f, h8, w8, cfg.in_channels)),
                         jnp.float32)
    t = jnp.float32(1.5)
    ctx = jnp.asarray(rng.normal(size=(b, 1 + cfg.num_id_tokens,
                                       cfg.cross_attention_dim)), jnp.float32)
    ids = jnp.asarray([[6.0, 127.0, 0.02]] * b, jnp.float32)
    pose = jnp.asarray(
        rng.normal(size=(b * f, h8, w8, cfg.block_out_channels[0])),
        jnp.float32)

    got = reloaded.call(p, sample, t, ctx, ids, pose)
    want = models.unet.apply(p, sample, t, ctx, ids, pose)
    # the exported program and the live model compile separately; fp32
    # scheduling differs (~1e-4 through the full UNet)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_vae_export_roundtrips(setup):
    from tools.export_model import export_vae_decode, export_vae_encode

    models, params = setup
    p = {"params": params["vae"]}
    f, h8, w8 = 2, 8, 8

    dec = _roundtrip(export_vae_decode(models.vae, p, f, h8, w8))
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(f, h8, w8, 4)), jnp.float32)
    got = dec.call(p, z)
    want = models.vae.apply(p, z, num_frames=f, method=models.vae.decode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    enc = _roundtrip(export_vae_encode(models.vae, p, 64, 64))
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 64, 64, 3)), jnp.float32)
    got = enc.call(p, x)
    want = models.vae.apply(p, x, method=models.vae.encode).mode()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_generate_export_roundtrip(setup):
    from stableanimator_tpu.core.config import PipelineConfig
    from stableanimator_tpu.pipeline import generate
    from tools.export_model import export_generate

    models, params = setup
    h = w = 64
    f = 2
    cfg = PipelineConfig(num_frames=f, tile_size=2, tile_overlap=1,
                         num_inference_steps=2, decode_chunk_size=2)
    exported = _roundtrip(export_generate(models, params, h, w, f, cfg))

    rng = np.random.default_rng(2)
    ref = jnp.asarray(rng.uniform(size=(1, h, w, 3)), jnp.float32)
    pose = jnp.asarray(rng.uniform(-1, 1, size=(f, h, w, 3)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)
    key = jax.random.PRNGKey(5)

    got = exported.call(params, ref, pose, emb, key)
    want = generate(models, params, ref, pose, emb, cfg,
                    rng=jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
