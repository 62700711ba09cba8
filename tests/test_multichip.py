"""Multi-chip inference: mesh-sharded generate must equal single-device."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from stableanimator_tpu.core.config import (
    CLIPVisionConfig,
    FaceEncoderConfig,
    PipelineConfig,
    PoseNetConfig,
    UNetConfig,
    VAEConfig,
)
from stableanimator_tpu.parallel import make_mesh, shard_params
from stableanimator_tpu.pipeline import build_models, generate, fast_init_params
import pytest

# compile-heavy (full pipeline graphs on XLA:CPU); excluded from the smoke tier
pytestmark = pytest.mark.slow


def test_sharded_generate_matches_single_device():
    from tests.conftest import build_micro_models

    models = build_micro_models()
    params = fast_init_params(models, height=64, width=64)

    rng = np.random.default_rng(9)
    ref = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    pose = jnp.asarray(rng.uniform(-1, 1, size=(4, 64, 64, 3)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)
    cfg = PipelineConfig(num_frames=4, tile_size=4, tile_overlap=1,
                         num_inference_steps=2, decode_chunk_size=2)

    base = generate(models, params, ref, pose, emb, cfg,
                    rng=jax.random.PRNGKey(11))

    mesh = make_mesh(data=2, frame=4)  # dp over CFG, sp over frames
    sharded_params = shard_params(params, mesh)
    out = generate(models, sharded_params, ref, pose, emb, cfg,
                   rng=jax.random.PRNGKey(11), mesh=mesh)
    # GSPMD partitioning reorders fp32 reductions vs the single-device
    # schedule; ~4e-4 on [0,1] pixels with realistic-magnitude random
    # params (a sharding bug — wrong halo, missing collective — shows as
    # O(0.1+) on many elements)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-3, atol=1e-3)
