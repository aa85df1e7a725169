"""Test harness: force the XLA CPU backend with 8 virtual devices.

This is the "fake backend" strategy (SURVEY.md §4): every kernel and the full
sharded train step run on an 8-device CPU mesh, emulating the TPU mesh without
hardware.

NOTE: this environment's sitecustomize force-registers the TPU ('axon')
platform and overrides JAX_PLATFORMS/XLA_FLAGS, so the env-var route does not
work; the reliable switch is jax.config.update BEFORE any backend is
initialized.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
