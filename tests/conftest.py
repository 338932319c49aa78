"""Test harness config: run everything on an 8-device virtual CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent-compilation-cache loads on CPU log two spurious ERROR lines per
# cached executable (XLA pseudo-feature mismatch, utils/compcache.py) —
# suppress XLA C++ logging below FATAL unless the caller asked otherwise.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The environment's axon TPU plugin overrides JAX_PLATFORMS at import time;
# an explicit config update wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: interpret-mode Pallas / long-compile / training tests "
        "excluded from the smoke tier")
    config.addinivalue_line(
        "markers",
        "smoke: fast tier — auto-applied to every test NOT marked slow, so "
        "`pytest -m smoke` covers every module's fast paths (<5 min warm)")


def pytest_collection_modifyitems(config, items):
    # smoke = complement of slow, by construction: new tests are smoke
    # until someone measures them slow, and no module can silently drop
    # out of the smoke tier.
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)
