"""IMU / wheel-odometry integration for NDT initial guesses.

TPU-native re-design of the reference's guess providers
(`src/odom_node.cpp:494-663`): `ImuCalc` integrates gyro rates into a rotation
delta and doubly integrates de-biased acceleration for translation;
`OdomCalc` integrates wheel-odometry twist; `ImuOdomCalc` combines IMU
rotation with wheel translation. All are batched, fixed-shape, jittable
integrations over per-scan sample windows; the odometry step consumes the
resulting delta through its `ext_delta` input in place of the constant-
velocity prediction (`use_imu`/`use_odom` in the reference,
`odom_node.cpp:237-254`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from xchu_slam_tpu.utils import se3

GRAVITY = 9.80665


class ImuWindow(NamedTuple):
    """Fixed-capacity IMU samples between two scans.

    stamps: float32[M]; gyro: float32[M,3] (rad/s, body); accel: float32[M,3]
    (m/s², body, gravity included); mask: bool[M]."""

    stamps: jnp.ndarray
    gyro: jnp.ndarray
    accel: jnp.ndarray
    mask: jnp.ndarray


class ImuState(NamedTuple):
    """Velocity estimate carried between scans (reference current_velocity_*)."""

    velocity: jnp.ndarray  # float32[3], world frame


@jax.jit
def integrate_imu(window: ImuWindow, pose0: jnp.ndarray,
                  state: ImuState) -> tuple[jnp.ndarray, ImuState]:
    """Integrate one inter-scan IMU window from world pose `pose0`.

    Returns (delta6 in the world frame, updated ImuState). Midpoint gyro
    integration for attitude; accelerations rotated to world, gravity
    removed, doubly integrated (the reference's crude but effective scheme,
    odom_node.cpp:525-585)."""
    dt = jnp.diff(window.stamps, prepend=window.stamps[:1])
    dt = jnp.where(window.mask, jnp.maximum(dt, 0.0), 0.0)

    def body(carry, inp):
        rpy, pos, vel = carry
        g_s, a_s, dt_s = inp
        R = se3.euler_to_matrix(rpy)
        # euler-rate update (matches the reference's per-sample euler sum)
        rpy_new = se3.wrap_angle(rpy + g_s * dt_s)
        a_world = R @ a_s - jnp.array([0.0, 0.0, GRAVITY])
        vel_new = vel + a_world * dt_s
        pos_new = pos + vel * dt_s + 0.5 * a_world * dt_s * dt_s
        return (rpy_new, pos_new, vel_new), None

    init = (pose0[3:6], pose0[:3], state.velocity)
    (rpy, pos, vel), _ = jax.lax.scan(
        body, init, (window.gyro, window.accel, dt))
    delta = jnp.concatenate([pos - pose0[:3],
                             se3.wrap_angle(rpy - pose0[3:6])])
    return delta, ImuState(velocity=vel)


class OdomWindow(NamedTuple):
    """Wheel-odometry twist samples: linear [M,3] + angular [M,3] (body)."""

    stamps: jnp.ndarray
    linear: jnp.ndarray
    angular: jnp.ndarray
    mask: jnp.ndarray


@jax.jit
def integrate_wheel_odom(window: OdomWindow, pose0: jnp.ndarray) -> jnp.ndarray:
    """Integrate wheel-odometry twist into a world-frame delta6
    (reference OdomCalc, odom_node.cpp:588-626)."""
    dt = jnp.diff(window.stamps, prepend=window.stamps[:1])
    dt = jnp.where(window.mask, jnp.maximum(dt, 0.0), 0.0)

    def body(carry, inp):
        rpy, pos = carry
        v_s, w_s, dt_s = inp
        R = se3.euler_to_matrix(rpy)
        pos_new = pos + R @ v_s * dt_s
        rpy_new = se3.wrap_angle(rpy + w_s * dt_s)
        return (rpy_new, pos_new), None

    (rpy, pos), _ = jax.lax.scan(
        body, (pose0[3:6], pose0[:3]), (window.linear, window.angular, dt))
    return jnp.concatenate([pos - pose0[:3], se3.wrap_angle(rpy - pose0[3:6])])


@jax.jit
def combine_imu_odom(imu_delta: jnp.ndarray, odom_delta: jnp.ndarray) -> jnp.ndarray:
    """ImuOdomCalc (odom_node.cpp:629-663): wheel translation + IMU rotation."""
    return jnp.concatenate([odom_delta[:3], imu_delta[3:6]])
