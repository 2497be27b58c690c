"""Test environment: force an 8-device virtual CPU mesh so multi-chip sharding
is exercised without TPU hardware (SURVEY.md §4 implication)."""

import os

# hard override: the shell env pins JAX_PLATFORMS=axon (the TPU tunnel) and the
# image pre-imports jax from sitecustomize, so the env var alone is already
# baked in — update jax.config directly before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from xchu_slam_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
