"""Training-step tests: loss sanity, gradient flow, data-parallel sharding
over the virtual 8-device mesh, checkpoint save/restore round trip."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stableanimator_tpu.core.config import (
    CLIPVisionConfig,
    FaceEncoderConfig,
    PipelineConfig,
    PoseNetConfig,
    TrainConfig,
    UNetConfig,
    VAEConfig,
)
from stableanimator_tpu.parallel import (
    make_mesh,
    replicated,
    shard_optimizer_state,
    shard_params,
)
from stableanimator_tpu.pipeline import build_models, fast_init_params
from stableanimator_tpu.train import (
    TrainState,
    create_train_state,
    make_train_step,
    train_loss,
)

# compile-heavy (full pipeline graphs on XLA:CPU); excluded from the smoke tier
pytestmark = pytest.mark.slow


def _tiny_models():
    from tests.conftest import build_micro_models

    return build_micro_models()


def _batch(b=2, f=2, hw=64, id_dim=32, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "frames": jnp.asarray(rng.uniform(-1, 1, (b, f, hw, hw, 3)), jnp.float32),
        "ref_image": jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)), jnp.float32),
        "pose_pixels": jnp.asarray(rng.uniform(-1, 1, (b, f, hw, hw, 3)), jnp.float32),
        "face_embed": jnp.asarray(rng.normal(size=(b, id_dim)), jnp.float32),
        "face_mask": jnp.asarray(
            rng.integers(0, 2, (b, f, hw, hw, 1)), jnp.float32),
    }


@pytest.fixture(scope="module")
def setup():
    models = _tiny_models()
    params = fast_init_params(models, height=64, width=64)
    return models, params


def test_loss_finite_and_positive(setup):
    models, params = setup
    cfg = TrainConfig()
    trainable = {k: params[k] for k in ("unet", "pose_net", "face_encoder")}
    frozen = {k: params[k] for k in ("vae", "clip")}
    loss = train_loss(models, trainable, frozen, _batch(), jax.random.PRNGKey(1),
                      cfg, PipelineConfig())
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_train_step_updates_params_and_decreases_loss(setup):
    models, params = setup
    cfg = dataclasses.replace(TrainConfig(), learning_rate=1e-3, lr_warmup_steps=1)
    state, tx = create_train_state(params, cfg)
    step = make_train_step(models, tx, cfg, PipelineConfig(),
                           conditioning_dropout_prob=0.0, donate=False)
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch, rng)  # same batch + rng folded by step
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 4
    assert np.isfinite(losses).all()
    # same data, few steps of overfitting: loss should drop on average
    assert losses[-1] < losses[0]


def test_data_parallel_matches_single_device(setup):
    """The sharded step must produce the same loss/params as unsharded."""
    models, params = setup
    cfg = dataclasses.replace(TrainConfig(), learning_rate=1e-4, lr_warmup_steps=1)
    batch = _batch(b=4)
    rng = jax.random.PRNGKey(3)

    state, tx = create_train_state(params, cfg)
    step = make_train_step(models, tx, cfg, PipelineConfig(),
                           conditioning_dropout_prob=0.0, donate=False)
    ref_state, ref_metrics = step(state, batch, rng)

    mesh = make_mesh(data=4, frame=1)
    state2, _ = create_train_state(params, cfg)
    state2 = TrainState(state2.step,
                        shard_params(state2.params, mesh),
                        shard_params(state2.frozen, mesh),
                        # ZeRO-1: optimizer moments sharded over the mesh
                        shard_optimizer_state(state2.opt_state, mesh))
    batch_sharded = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch)
    dp_state, dp_metrics = step(state2, batch_sharded, rng)

    np.testing.assert_allclose(float(dp_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    ref_leaf = ref_state.params["pose_net"]["final_proj"]["kernel"]
    dp_leaf = dp_state.params["pose_net"]["final_proj"]["kernel"]
    np.testing.assert_allclose(np.asarray(dp_leaf), np.asarray(ref_leaf),
                               rtol=1e-5, atol=1e-6)


def test_zero_sharding_multi_axis():
    """zero_sharding_for with a tuple of axes splits a leaf over the
    COMBINED device count — the 8-way Adam-moment split on the (4,2)
    training mesh (fp32 moments are ~11.4 GB replicated on the full-unet
    finetune; /8 is what fits a 16 GB v5e, tools/aot_v5e8.py)."""
    from stableanimator_tpu.parallel.mesh import make_mesh, zero_sharding_for

    mesh = make_mesh(data=4, frame=2)

    class Leaf:
        ndim = 2
        shape = (16, 3)

    sh = zero_sharding_for(Leaf(), mesh, ("data", "frame"))
    assert sh.spec == P(("data", "frame"), None)

    class Odd:  # 12 % 8 != 0 -> replicated
        ndim = 1
        shape = (12,)

    assert zero_sharding_for(Odd(), mesh, ("data", "frame")).spec == P(None)
    # single-axis behaviour unchanged
    assert zero_sharding_for(Leaf(), mesh, "data").spec == P("data", None)


def test_checkpoint_roundtrip(tmp_path, setup):
    from stableanimator_tpu.core.checkpoint import CheckpointManager

    models, params = setup
    cfg = TrainConfig()
    state, _ = create_train_state(params, cfg)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), total_limit=2)
    mgr.save(0, {"params": state.params})
    mgr.save(2000, {"params": state.params})
    assert mgr.latest_step() == 2000
    restored = mgr.restore({"params": state.params})
    leaf = restored["params"]["unet"]["conv_in"]["kernel"]
    np.testing.assert_array_equal(np.asarray(leaf),
                                  np.asarray(state.params["unet"]["conv_in"]["kernel"]))
    mgr.close()
