"""Test environment: force an 8-virtual-device CPU platform so every mesh /
sharding / pjit test exercises real multi-device SPMD lowering without TPU
hardware (the standard JAX idiom for testing multi-chip logic)."""

import os

# Hard override: the ambient environment points JAX at the real TPU tunnel
# (JAX_PLATFORMS=axon); unit tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The ambient sitecustomize registers the axon TPU PJRT plugin in every
# process and wins over the env var, so force the platform via jax.config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"
