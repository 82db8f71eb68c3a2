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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for tests"

# ---------------------------------------------------------------------------
# Test tiers (VERDICT r2 item 9): `pytest -m fast` finishes in minutes on a
# 1-core host; the full suite is the deep run. Files below are the
# compile-heavy integration tier (measured per-file wall times in
# BASELINE.md "test tiers"); everything else is marked fast.
# ---------------------------------------------------------------------------

SLOW_FILES = {
    "test_cli_smoke.py",      # 406 s
    "test_generative.py",     # 460 s
    "test_models_extra.py",   # 308 s
    "test_transforms.py",     # 264 s
    "test_misc_modules.py",   # 235 s
    "test_ssl.py",            # 183 s
    "test_layers.py",         # 163 s
    "test_unet.py",           # 143 s
    "test_detection.py",      # 105 s
    "test_pallas_ops.py",     #  76 s
    "test_train.py",          #  61 s
    # opt-in (ADELL_RUN_CONVERGENCE_PARITY=1): 30-60 min head-to-head
    "test_convergence_parity.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in SLOW_FILES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)
