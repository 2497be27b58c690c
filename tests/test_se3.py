import jax
import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.utils import se3


def test_euler_matrix_roundtrip(rng):
    rpy = rng.uniform(-1.2, 1.2, (64, 3)).astype(np.float32)
    R = se3.euler_to_matrix(jnp.asarray(rpy))
    back = np.asarray(se3.matrix_to_euler(R))
    np.testing.assert_allclose(back, rpy, atol=1e-4)


def test_euler_matrix_is_zyx(rng):
    """R must equal Rz(yaw)Ry(pitch)Rx(roll) — the reference common.h convention."""
    r, p, y = 0.3, -0.5, 1.1
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    expected = Rz @ Ry @ Rx
    got = np.asarray(se3.euler_to_matrix(jnp.array([r, p, y], jnp.float32)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_pose_matrix_roundtrip(rng):
    pose = rng.uniform(-1, 1, (16, 6)).astype(np.float32)
    pose[:, :3] *= 50
    T = se3.pose_to_matrix(jnp.asarray(pose))
    back = np.asarray(se3.matrix_to_pose(T))
    np.testing.assert_allclose(back, pose, atol=1e-3)


def test_transform_points_matches_matrix(rng):
    pose = jnp.asarray(rng.uniform(-1, 1, (6,)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-10, 10, (100, 3)).astype(np.float32))
    T = se3.pose_to_matrix(pose)
    a = se3.transform_points(T, pts)
    b = se3.rotate_translate(pose, pts)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_inverse(rng):
    pose = jnp.asarray(rng.uniform(-1, 1, (6,)).astype(np.float32))
    T = se3.pose_to_matrix(pose)
    I = np.asarray(se3.inverse(T) @ T)
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.uniform(-0.8, 0.8, (32, 6)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    back = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(back, xi, atol=1e-4)


def test_se3_exp_small_angle():
    xi = jnp.array([0.1, -0.2, 0.3, 1e-9, -1e-9, 1e-9], jnp.float32)
    T = np.asarray(se3.se3_exp(xi))
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], [0.1, -0.2, 0.3], atol=1e-6)


def test_so3_log_consistency(rng):
    w = rng.uniform(-2, 2, (32, 3)).astype(np.float32)
    R = se3.so3_exp(jnp.asarray(w))
    back = np.asarray(se3.so3_log(R))
    R2 = np.asarray(se3.so3_exp(jnp.asarray(back)))
    np.testing.assert_allclose(np.asarray(R), R2, atol=1e-4)


def test_jit_compatible():
    f = jax.jit(lambda p, x: se3.rotate_translate(p, x))
    out = f(jnp.zeros(6), jnp.ones((10, 3)))
    np.testing.assert_allclose(np.asarray(out), np.ones((10, 3)), atol=1e-6)
