"""Test configuration: force CPU JAX with 8 virtual devices so mesh/sharding
tests run hermetically without TPU hardware (mirrors the driver's
dryrun_multichip setup).

Note: this environment's sitecustomize force-registers the 'axon' TPU
platform and overrides JAX_PLATFORMS, so the env var alone is not enough —
jax.config must be updated after import."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
