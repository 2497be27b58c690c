import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.ops import ground
from xchu_slam_tpu.utils import linalg

SPEC = ground.GroundSpec()


def make_scene(rng, n_ground=2000, n_wall=800, n_noise=100, tilt=0.0,
               sensor_h=1.73):
    g = np.c_[rng.uniform(-30, 30, (n_ground, 2)),
              -sensor_h + rng.normal(0, 0.02, n_ground)]
    w = np.c_[rng.uniform(-30, 30, n_wall), np.full(n_wall, 8.0),
              rng.uniform(-sensor_h, 3, n_wall)]
    z = rng.uniform(-3, 3, (n_noise, 3)) + np.array([5, -5, 0])
    pts = np.vstack([g, w, z]).astype(np.float32)
    return pts


def test_smallest_eigvec(rng):
    # plane scatter: normal must be ±z
    pts = rng.normal(0, 1, (500, 3)).astype(np.float32)
    pts[:, 2] *= 0.01
    cov = np.cov(pts.T)
    v = np.asarray(linalg.smallest_eigvec3(jnp.asarray(cov, jnp.float32)))
    assert abs(v[2]) > 0.99


def test_detect_plane_flat(rng):
    pts = make_scene(rng)
    res = ground.detect_plane(jnp.asarray(pts), jnp.ones(len(pts), bool), SPEC)
    assert bool(res.valid)
    c = np.asarray(res.coeffs)
    assert c[2] > 0.99                       # normal ≈ +z
    np.testing.assert_allclose(c[3], 1.73, atol=0.1)  # plane height
    gm = np.asarray(res.ground_mask)
    assert gm[:2000].mean() > 0.7            # most ground points are inliers
    assert gm[2000:2800].mean() < 0.05       # wall points are not


def test_detect_plane_none_when_no_ground(rng):
    # only a vertical wall in the clip band
    w = np.c_[rng.uniform(-30, 30, 2000), np.full(2000, 8.0),
              rng.uniform(-4, 0.5, 2000)].astype(np.float32)
    res = ground.detect_plane(jnp.asarray(w), jnp.ones(len(w), bool), SPEC)
    assert not bool(res.valid)


def test_detect_plane_masked_empty():
    pts = np.zeros((256, 3), np.float32)
    res = ground.detect_plane(jnp.asarray(pts), jnp.zeros(256, bool), SPEC)
    assert not bool(res.valid)
    assert np.isfinite(np.asarray(res.coeffs)).all()
