"""
Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

The container's sitecustomize may have already registered a TPU-tunnel PJRT
plugin at interpreter startup; overriding jax_platforms via jax.config (after
import, before first backend use) still wins, and XLA_FLAGS set here is read
at backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for tests"
