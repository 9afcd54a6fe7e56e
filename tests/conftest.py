"""Test config: force an 8-device virtual CPU mesh so multi-chip sharding
logic is exercised without TPU hardware.

Note: the environment may pre-register a TPU plugin and pin JAX_PLATFORMS;
plain env vars are clobbered by sitecustomize, so we also force the platform
through jax.config after import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()
