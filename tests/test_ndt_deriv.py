"""Closed-form NDT derivatives vs autodiff oracle (SURVEY.md §7 step 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.ops import ndt, ndt_deriv, voxel_map as vm
from tests.test_ndt import make_world, build_grid, GSPEC


def setup(rng):
    world = make_world(rng)
    grid = build_grid(world)
    src = jnp.asarray(world[rng.choice(len(world), 1500, replace=False)])
    mask = jnp.asarray(np.r_[np.ones(1400, bool), np.zeros(100, bool)])
    d1, d2 = ndt.gauss_constants(0.55, 2.0)
    return grid, src, mask, d1, d2


def test_value_grad_hess_match_autodiff(rng):
    grid, src, mask, d1, d2 = setup(rng)
    for pose in [np.zeros(6), np.array([0.3, -0.2, 0.1, 0.03, -0.02, 0.1])]:
        pose = jnp.asarray(pose, jnp.float32)

        def loss(p):
            return ndt.ndt_loss(p, src, mask, grid, GSPEC, d1, d2)

        L_ref = float(loss(pose))
        g_ref = np.asarray(jax.grad(loss)(pose))
        H_ref = np.asarray(jax.hessian(loss)(pose))

        L, g, H = ndt_deriv.ndt_value_grad_hess(pose, src, mask, grid, GSPEC,
                                                d1, d2)
        np.testing.assert_allclose(float(L), L_ref, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g), g_ref, rtol=2e-3,
                                   atol=2e-2 * (1 + np.abs(g_ref).max() * 1e-3))
        np.testing.assert_allclose(np.asarray(H), H_ref, rtol=5e-3,
                                   atol=0.05 * (1 + np.abs(H_ref).max() * 1e-3))


def test_grad_only_mode(rng):
    grid, src, mask, d1, d2 = setup(rng)
    pose = jnp.asarray([0.1, 0.0, 0.0, 0.0, 0.0, 0.02], jnp.float32)
    L1, g1, H1 = ndt_deriv.ndt_value_grad_hess(pose, src, mask, grid, GSPEC,
                                               d1, d2, want_hess=False)
    L2, g2, _ = ndt_deriv.ndt_value_grad_hess(pose, src, mask, grid, GSPEC,
                                              d1, d2, want_hess=True)
    np.testing.assert_allclose(float(L1), float(L2))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))
    assert np.all(np.asarray(H1) == 0.0)
