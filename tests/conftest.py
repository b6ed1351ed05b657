"""Test config: run on CPU with 8 virtual devices for sharding tests."""

import os

# Must happen before jax initializes its backends. Note: under the axon TPU
# plugin the JAX_PLATFORMS env var alone is not honored — we also set the
# config flag below.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()
# Keep geometry artifact caching out of test runs.
os.environ.setdefault("GRAPHCAST_TPU_CACHE", "")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8
