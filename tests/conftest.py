"""Test harness: force the XLA CPU backend with 8 virtual devices.

This is the "fake backend" strategy (SURVEY.md §4): every kernel and the full
sharded train step run on an 8-device CPU mesh, emulating the TPU mesh without
hardware. Must run before anything imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
