import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.utils import linalg


def random_sym(rng, n):
    A = rng.normal(size=(n, 3, 3)).astype(np.float32)
    return (A @ A.transpose(0, 2, 1) + 0.1 * np.eye(3)).astype(np.float32)


def test_sym6_roundtrip(rng):
    S = random_sym(rng, 32)
    packed = linalg.mat_to_sym6(jnp.asarray(S))
    back = np.asarray(linalg.sym6_to_mat(packed))
    np.testing.assert_allclose(back, S, atol=1e-6)


def test_sym6_matvec(rng):
    S = random_sym(rng, 32)
    v = rng.normal(size=(32, 3)).astype(np.float32)
    got = np.asarray(linalg.sym6_matvec(linalg.mat_to_sym6(jnp.asarray(S)), jnp.asarray(v)))
    expected = np.einsum("nij,nj->ni", S, v)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_eigvals_match_numpy(rng):
    S = random_sym(rng, 64)
    got = np.asarray(linalg.sym_eigvals3(jnp.asarray(S)))
    expected = np.linalg.eigvalsh(S.astype(np.float64))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-3)


def test_eigvals_degenerate():
    S = jnp.broadcast_to(2.5 * jnp.eye(3), (4, 3, 3))
    got = np.asarray(linalg.sym_eigvals3(S))
    np.testing.assert_allclose(got, 2.5, atol=1e-5)


def test_inv3(rng):
    S = random_sym(rng, 32)
    inv = np.asarray(linalg.inv3(jnp.asarray(S)))
    np.testing.assert_allclose(
        np.einsum("nij,njk->nik", inv, S), np.tile(np.eye(3), (32, 1, 1)), atol=1e-3
    )


def test_inflate_and_invert_bounds_condition(rng):
    """Degenerate (planar) covariances must come out with bounded condition."""
    # points on a plane → rank-2 covariance
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pts[:, 2] = 0.0
    cov = np.cov(pts.T).astype(np.float32)
    icov = np.asarray(linalg.inflate_and_invert_cov(jnp.asarray(cov)[None], 0.01))[0]
    ev = np.linalg.eigvalsh(icov.astype(np.float64))
    assert np.all(ev > 0)
    assert ev.max() / ev.min() < 200.0  # 1/0.01 plus slack


def test_inflate_no_change_when_well_conditioned(rng):
    S = random_sym(rng, 8)
    icov = np.asarray(linalg.inflate_and_invert_cov(jnp.asarray(S), 0.01))
    lam = np.linalg.eigvalsh(S.astype(np.float64))
    well = lam[:, 0] >= 0.01 * lam[:, 2]
    expected = np.linalg.inv(S.astype(np.float64))
    for i in range(8):
        if well[i]:
            np.testing.assert_allclose(icov[i], expected[i], rtol=2e-2, atol=1e-3)
