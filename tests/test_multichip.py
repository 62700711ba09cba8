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


def test_sharded_grouped_generate_matches_single_device():
    """Long-video path under a mesh: 23 frames at tile 4/overlap 1 = 8
    tiles -> grouped denoise (groups of 2) + segmented dispatch — the code
    path the 450-frame demo takes, which the flat-path equality test above
    (1 tile) never reaches. Covers the per-step constant-index tile
    gather/scatter and the hoisted pose-group xs under GSPMD sharding."""
    from tests.conftest import build_micro_models
    from stableanimator_tpu.diffusion.tiling import auto_tile_batch
    from stableanimator_tpu.pipeline.animation import resolve_steps_per_dispatch

    models = build_micro_models()
    params = fast_init_params(models, height=64, width=64)

    rng = np.random.default_rng(13)
    f = 23
    ref = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)), jnp.float32)
    pose = jnp.asarray(rng.uniform(-1, 1, size=(f, 64, 64, 3)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)
    cfg = PipelineConfig(num_frames=f, tile_size=4, tile_overlap=1,
                         num_inference_steps=2, decode_chunk_size=2)
    # preconditions: this config actually routes grouped + segmented
    assert auto_tile_batch(f, 4, 1) == 2
    assert resolve_steps_per_dispatch(cfg) is not None

    base = generate(models, params, ref, pose, emb, cfg,
                    rng=jax.random.PRNGKey(11))

    mesh = make_mesh(data=2, frame=4)
    sharded_params = shard_params(params, mesh)
    out = generate(models, sharded_params, ref, pose, emb, cfg,
                   rng=jax.random.PRNGKey(11), mesh=mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-3, atol=1e-3)


class TestProConfigLowering:
    """Shape-real SPMD compile checks (VERDICT round-2 item #6): the micro
    test above runs at 64^2 where a wrong halo/collective spec could hide;
    these compile (not run) the REAL pro-config shapes on the virtual
    8-device mesh and assert GSPMD inserted the expected collectives.
    Compile-once: results persist in the test compile cache."""

    @staticmethod
    def _abstract(tree, sharding):
        return jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sharding),
            tree)

    def test_pro_generate_576x1024_compiles_with_collectives(self):
        import functools

        from jax.sharding import NamedSharding, PartitionSpec as P

        from stableanimator_tpu.pipeline.animation import (
            _generate_impl,
            init_params,
        )

        models = build_models(dtype=jnp.bfloat16)  # FULL-size model zoo
        h, w, f = 576, 1024, 16
        cfg = PipelineConfig(height=h, width=w, num_frames=f, tile_size=16,
                             tile_overlap=4, num_inference_steps=2,
                             decode_chunk_size=4)
        mesh = make_mesh(data=2, frame=4)
        rep = NamedSharding(mesh, P())
        shapes = jax.eval_shape(lambda: init_params(
            models, jax.random.PRNGKey(0), height=h, width=w, num_frames=2))
        params = self._abstract(
            jax.tree_util.tree_map(
                lambda s: jax.ShapeDtypeStruct(
                    s.shape,
                    jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
                shapes), rep)
        fn = jax.jit(functools.partial(_generate_impl, models, face_opt=None,
                                       mesh=mesh, clip_image=None),
                     static_argnums=(4,))
        compiled = fn.lower(
            params,
            jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32, sharding=rep),
            jax.ShapeDtypeStruct((f, h, w, 3), jnp.float32, sharding=rep),
            jax.ShapeDtypeStruct((1, 512), jnp.float32, sharding=rep),
            cfg,
            jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep),
        ).compile()
        txt = compiled.as_text()
        # frame-axis halos through the (3,1,1) temporal convs / temporal
        # attention -> collective-permute or all-gather; CFG/data sharding
        # -> all-reduce in the norms' stats
        assert txt.count("collective-permute") > 0, "no frame-halo exchanges"
        assert txt.count("all-gather") > 0
        assert txt.count("all-reduce") > 0
        # measured on jax 0.8: 447 collective-permutes, 115 all-gathers,
        # 392 all-reduces, 52 all-to-alls; compile ~53 s (cached afterwards)

    def test_longvid_450f_segment_compiles_with_collectives(self):
        """The 450-frame demo's dispatch unit (one segment of the grouped
        denoise: 38 groups x 1 tile at 512^2 — under a mesh the group size
        is forced to 1 so the CFG axis matches the data mesh axis, see
        pipeline.denoise) lowers and compiles on the 2x4 mesh — the
        multi-chip path for the reference's 15 s demo video
        (README.md:367). Compiling the SEGMENT (not the whole generate)
        matches production: _generate_segmented dispatches this exact
        program per step at 450f."""
        import functools

        from jax.sharding import NamedSharding, PartitionSpec as P

        from stableanimator_tpu.ops.gate import ACTIVE_MESH
        from stableanimator_tpu.pipeline.animation import (
            _denoise_segment,
            init_params,
        )

        models = build_models(dtype=jnp.bfloat16)
        h8 = w8 = 512 // 8
        f = 450
        cfg = PipelineConfig(height=512, width=512, num_frames=f,
                             tile_size=16, tile_overlap=4,
                             num_inference_steps=25, decode_chunk_size=4)
        mesh = make_mesh(data=2, frame=4)
        rep = NamedSharding(mesh, P())
        shapes = jax.eval_shape(lambda: init_params(
            models, jax.random.PRNGKey(0), height=512, width=512,
            num_frames=2))
        params = self._abstract(
            jax.tree_util.tree_map(
                lambda s: jax.ShapeDtypeStruct(
                    s.shape,
                    jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
                shapes), rep)
        fn = jax.jit(functools.partial(_denoise_segment, models, cfg=cfg,
                                       num_steps=1, mesh=mesh))
        tok = ACTIVE_MESH.set(mesh)
        try:
            compiled = fn.lower(
                params,
                jax.ShapeDtypeStruct((1, f, h8, w8, 4), jnp.float32,
                                     sharding=rep),
                jax.ShapeDtypeStruct((2, 5, 1024), jnp.float32, sharding=rep),
                jax.ShapeDtypeStruct((2, h8, w8, 4), jnp.float32,
                                     sharding=rep),
                jax.ShapeDtypeStruct((2, 3), jnp.float32, sharding=rep),
                jax.ShapeDtypeStruct((f, h8, w8, 320), jnp.float32,
                                     sharding=rep),
                step_start=jax.ShapeDtypeStruct((), jnp.int32, sharding=rep),
            ).compile()
        finally:
            ACTIVE_MESH.reset(tok)
        txt = compiled.as_text()
        assert txt.count("collective-permute") > 0, "no frame-halo exchanges"
        assert txt.count("all-reduce") > 0

    def test_full_size_train_step_compiles_with_grad_allreduce(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from stableanimator_tpu.core.config import TrainConfig
        from stableanimator_tpu.pipeline.animation import init_params
        from stableanimator_tpu.train.train_step import (
            make_optimizer,
            make_train_step,
        )

        models = build_models(dtype=jnp.bfloat16)
        h, w, f, b = 512, 512, 16, 8  # command_train.sh rec bucket, dp=8
        mesh = make_mesh(data=8, frame=1)
        rep = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        tcfg = TrainConfig()
        pipe = PipelineConfig(height=h, width=w, num_frames=f)
        pshapes = jax.eval_shape(lambda: init_params(
            models, jax.random.PRNGKey(0), height=h, width=w, num_frames=2))

        from stableanimator_tpu.train.train_step import create_train_state

        state_shapes = jax.eval_shape(lambda: create_train_state(
            jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                                   pshapes), tcfg)[0])
        state = self._abstract(state_shapes, rep)
        batch = {
            "frames": jax.ShapeDtypeStruct((b, f, h, w, 3), jnp.float32,
                                           sharding=data),
            "ref_image": jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32,
                                              sharding=data),
            "face_embed": jax.ShapeDtypeStruct((b, 512), jnp.float32,
                                               sharding=data),
            "pose_pixels": jax.ShapeDtypeStruct((b, f, h, w, 3), jnp.float32,
                                                sharding=data),
            "face_mask": jax.ShapeDtypeStruct((b, f, h, w), jnp.float32,
                                              sharding=data),
        }
        rng = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)
        step = make_train_step(models, make_optimizer(tcfg), tcfg, pipe,
                               donate=False)
        compiled = step.lower(state, batch, rng).compile()
        txt = compiled.as_text()
        # data-parallel gradients reduce over the mesh (the TPU-native
        # replacement for the reference's accelerate/NCCL DDP, SURVEY §2.2)
        assert txt.count("all-reduce") > 0, "no gradient all-reduce emitted"
        # measured on jax 0.8: 1613 all-reduces; compile ~7 min first time
        # (persisted in the compile cache afterwards)
