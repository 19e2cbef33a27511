"""Test configuration: force CPU JAX with 8 virtual devices so mesh/sharding
tests run without TPU hardware (mirrors the driver's dryrun_multichip setup)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env vars are set)

jax.config.update("jax_default_matmul_precision", "highest")
