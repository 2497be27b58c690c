"""Pallas fused nearest-neighbor kernel vs dense brute force.

Runs in interpret mode on CPU (the TPU path is exercised by the bench and
the loop-verification integration on hardware)."""

import numpy as np
import jax.numpy as jnp
import pytest

from xchu_slam_tpu.ops.pallas import nn_kernel


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_nn_kernel_matches_bruteforce(rng):
    N, M = nn_kernel.SRC_TILE, nn_kernel.TGT_TILE * 2
    src = rng.normal(size=(N, 3)).astype(np.float32) * 10.0
    tgt = rng.normal(size=(M, 3)).astype(np.float32) * 10.0
    mask = np.ones(M, bool)
    mask[M // 3:M // 2] = False  # a masked-out stretch

    idx, d2 = nn_kernel.nearest_neighbor(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
    idx, d2 = np.asarray(idx), np.asarray(d2)

    dist = ((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
    dist[:, ~mask] = np.inf
    ref_idx = dist.argmin(1)
    ref_d2 = dist[np.arange(N), ref_idx]

    assert mask[idx].all()
    # ties/float noise can pick a different index; distances must agree
    np.testing.assert_allclose(d2, ref_d2, rtol=1e-4, atol=1e-4)


def test_nn_kernel_mask_all_but_one(rng):
    N, M = nn_kernel.SRC_TILE, nn_kernel.TGT_TILE
    src = rng.normal(size=(N, 3)).astype(np.float32)
    tgt = rng.normal(size=(M, 3)).astype(np.float32)
    mask = np.zeros(M, bool)
    mask[5] = True
    idx, d2 = nn_kernel.nearest_neighbor(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
    assert (np.asarray(idx) == 5).all()
    ref = ((src - tgt[5]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d2), ref, rtol=1e-4, atol=1e-4)
