"""Test environment: force an 8-virtual-device CPU platform so every mesh /
sharding / pjit test exercises real multi-device SPMD lowering without TPU
hardware (the standard JAX idiom for testing multi-chip logic)."""

import os

# Hard override: the ambient environment points JAX at the real TPU tunnel
# (JAX_PLATFORMS=axon); unit tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # ~30% less XLA:CPU compile time; tests are compile-dominated and every
    # numerical comparison is between two paths compiled under the same flag
    flags = flags + " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The ambient sitecustomize registers the axon TPU PJRT plugin in every
# process and wins over the env var, so force the platform via jax.config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: the suite is XLA:CPU-compile dominated; repeat
# runs (developer loop, CI re-runs) hit the cache and skip the big compiles.
if os.environ.get("SA_TEST_NO_CACHE", "0") in ("0", ""):
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"


def build_micro_models(**overrides):
    """Depth-1 micro model zoo for compile-heavy pipeline/train/SPMD tests:
    same topology as the full stack (4-level UNet with CrossAttn/Down/Up
    blocks, temporal mixing, all five conditioning models) but one
    resnet/transformer layer per block — the graph structure every test
    exercises is identical, XLA:CPU compile time is roughly halved.
    Parity tests that pin exact architecture depth build their own configs."""
    from stableanimator_tpu.core.config import micro_model_kwargs
    from stableanimator_tpu.pipeline import build_models

    kwargs = dict(micro_model_kwargs(), dtype=None, use_flash=False)
    kwargs.update(overrides)
    return build_models(**kwargs)
