"""Test config: force an 8-device virtual CPU mesh so multi-chip sharding
logic is exercised without TPU hardware.

Note: the environment may pre-register a TPU plugin and pin JAX_PLATFORMS;
plain env vars are clobbered by sitecustomize, so we also force the platform
through jax.config after import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Single-threaded XLA:CPU — the Eigen pool intermittently aborts inside
# ThunkExecutor on this 1-core box (see __graft_entry__.py).
if "xla_cpu_multi_thread_eigen" not in flags:
    flags = (flags + " --xla_cpu_multi_thread_eigen=false").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the fast tier is compile-dominated on this
# 1-core box (same shapes recompiled every run); a warm cache cuts the tier
# by an order of magnitude. Safe to share across runs — entries key on HLO +
# compile options + platform.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", jax.devices()
