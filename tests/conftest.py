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

# PER-XDIST-WORKER cache dirs: two workers writing one cache dir have
# corrupted entries (observed rounds 4-5: a worker segfaults reading a
# concurrently-written entry, goes defunct, and the master hangs at ~95%
# forever). Worker names are stable (gw0/gw1/...), so cross-run reuse is
# kept per worker.
_worker = os.environ.get("PYTEST_XDIST_WORKER", "main")
compile_cache.enable(os.path.join(compile_cache.DEFAULT_DIR, _worker))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
