"""Test config: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "multi-node testing without a cluster"
(the reference has none — SURVEY.md §4): XLA's host platform exposes N
virtual devices, so mesh/pjit/collective paths are exercised for real.

Note: the ``axon`` TPU plugin on this machine overrides the JAX_PLATFORMS
env var, so we must force the platform via jax.config *after* import.
Set MTX_TEST_PLATFORM=tpu to run the suite on real hardware instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if os.environ.get("MTX_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# The <10-min verification tier (`pytest -m fast`): encoder + converter
# parity, the Data2Seq facade, serving, the fused kernels, raw-media
# ingestion and the torch-twin training-equivalence check — the
# load-bearing surfaces. The full suite stays the release gate.
FAST_MODULES = {
    "test_encoder_parity",
    "test_convert_extra",
    "test_pipeline_facade",
    "test_serving",
    "test_fused_block",
    "test_image_folder",
    "test_train_equivalence",
    "test_demo",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in FAST_MODULES:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bounded_jax_caches():
    """Drop compiled-executable caches between test modules.

    One pytest process runs 300+ jit-heavy tests; without this the
    accumulated XLA CPU executables/tracing state can reach segfault
    territory late in the run (observed at ~91% in round 3). Modules
    rarely share jit shapes, so the lost reuse is negligible."""
    yield
    jax.clear_caches()
