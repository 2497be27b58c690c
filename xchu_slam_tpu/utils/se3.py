"""SE(3) / euler utilities.

Conventions follow the reference (`include/xchu_mapping/common.h:51-71`):
pose6 = [x, y, z, roll, pitch, yaw], R = Rz(yaw) @ Ry(pitch) @ Rx(roll)
(ZYX intrinsic — the tf/Eigen createQuaternionFromRPY convention).

Also provides SE(3) exp/log for the pose-graph optimizer (the reference
delegates this to GTSAM `Pose3`; here it is explicit and jittable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# correctness-critical small matmuls must not drop to bf16 on TPU
_PREC = jax.lax.Precision.HIGHEST

_EPS = 1e-9


def euler_to_matrix(rpy: jnp.ndarray) -> jnp.ndarray:
    """rpy [..., 3] → rotation matrix [..., 3, 3], R = Rz(y)Ry(p)Rx(r)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], -1)
    return jnp.stack([row0, row1, row2], -2)


def matrix_to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] → rpy [..., 3] (ZYX extraction)."""
    sp = -R[..., 2, 0]
    sp = jnp.clip(sp, -1.0, 1.0)
    pitch = jnp.arcsin(sp)
    # gimbal-safe: near |pitch|=90° fall back to yaw=0 split
    cp = jnp.sqrt(jnp.maximum(1.0 - sp * sp, _EPS))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    near_gimbal = cp < 1e-4
    roll_g = jnp.arctan2(-R[..., 1, 2], R[..., 1, 1])
    roll = jnp.where(near_gimbal, roll_g, roll)
    yaw = jnp.where(near_gimbal, 0.0, yaw)
    return jnp.stack([roll, pitch, yaw], -1)


def pose_to_matrix(pose: jnp.ndarray) -> jnp.ndarray:
    """pose6 [..., 6] → homogeneous transform [..., 4, 4]."""
    R = euler_to_matrix(pose[..., 3:6])
    t = pose[..., :3]
    top = jnp.concatenate([R, t[..., :, None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), (*R.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], -2)


def matrix_to_pose(T: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([T[..., :3, 3], matrix_to_euler(T[..., :3, :3])], -1)


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply [4,4] (or pose-shaped batch) transform to pts [..., N, 3]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.matmul(pts, jnp.swapaxes(R, -1, -2), precision=_PREC) + t[..., None, :]


def rotate_translate(pose: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Transform pts [N,3] by pose6 [6] without building the 4×4."""
    R = euler_to_matrix(pose[3:6])
    return jnp.matmul(pts, R.T, precision=_PREC) + pose[:3]


def compose(T_a: jnp.ndarray, T_b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(T_a, T_b, precision=_PREC)


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.matmul(Rt, t[..., :, None], precision=_PREC)[..., 0]
    top = jnp.concatenate([Rt, ti[..., :, None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], T.dtype), (*T.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], -2)


# --------------------------------------------------------------------------- #
# so(3) / se(3)
# --------------------------------------------------------------------------- #


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] → skew-symmetric [..., 3, 3]."""
    z = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], z, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], z], -1),
        ],
        -2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] → [..., 3, 3]."""
    theta2 = jnp.sum(w * w, -1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS)
    small = theta2[..., 0, 0] < 1e-8
    a = jnp.where(small[..., None, None], 1.0 - theta2 / 6.0, a)
    b = jnp.where(small[..., None, None], 0.5 - theta2 / 24.0, b)
    return I + a * W + b * jnp.matmul(W, W, precision=_PREC)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] → [..., 3]. Autodiff-safe near the identity (double-where
    guards: the untaken branch must not produce NaN in reverse mode)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # keep arccos' argument strictly inside (−1, 1) so its gradient is finite
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0 + 1e-6, 1.0 - 1e-6)
    theta = jnp.arccos(cos_t)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    small = theta[..., None] < 1e-4
    theta_safe = jnp.where(small, 1.0, theta[..., None])
    scale_large = theta_safe / (2.0 * jnp.sin(theta_safe))
    scale = jnp.where(small, 0.5 + theta[..., None] ** 2 / 12.0, scale_large)
    # near theta=pi the vee formula degrades; acceptable for pose-graph steps
    return scale * vee


def _V_matrix(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian of SO(3)."""
    theta2 = jnp.sum(w * w, -1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS)
    c = (theta - jnp.sin(theta)) / (theta2.clip(_EPS) * theta)
    small = theta2[..., 0, 0] < 1e-8
    b = jnp.where(small[..., None, None], 0.5 - theta2 / 24.0, b)
    c = jnp.where(small[..., None, None], 1.0 / 6.0 - theta2 / 120.0, c)
    return I + b * W + c * jnp.matmul(W, W, precision=_PREC)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """twist [..., 6] (v, w) → [..., 4, 4]."""
    v, w = xi[..., :3], xi[..., 3:6]
    R = so3_exp(w)
    t = jnp.matmul(_V_matrix(w), v[..., :, None], precision=_PREC)[..., 0]
    top = jnp.concatenate([R, t[..., :, None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], xi.dtype), (*R.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], -2)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] → twist [..., 6] (v, w)."""
    w = so3_log(T[..., :3, :3])
    Vinv = jnp.linalg.inv(_V_matrix(w))
    v = jnp.matmul(Vinv, T[..., :3, 3][..., :, None], precision=_PREC)[..., 0]
    return jnp.concatenate([v, w], -1)


def wrap_angle(a: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))
