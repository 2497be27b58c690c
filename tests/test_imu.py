import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.ops import imu


def make_window(stamps, gyro, accel):
    m = len(stamps)
    return imu.ImuWindow(
        stamps=jnp.asarray(stamps, jnp.float32),
        gyro=jnp.asarray(gyro, jnp.float32),
        accel=jnp.asarray(accel, jnp.float32),
        mask=jnp.ones(m, bool),
    )


def test_imu_stationary():
    """Zero rates + gravity-only accel → zero delta."""
    m = 20
    stamps = np.linspace(0, 0.1, m)
    gyro = np.zeros((m, 3))
    accel = np.tile([0, 0, imu.GRAVITY], (m, 1))
    d, st = imu.integrate_imu(make_window(stamps, gyro, accel),
                              jnp.zeros(6), imu.ImuState(jnp.zeros(3)))
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.velocity), 0.0, atol=1e-4)


def test_imu_constant_yaw_rate():
    m = 50
    stamps = np.linspace(0, 0.1, m)
    gyro = np.tile([0, 0, 1.0], (m, 1))  # 1 rad/s yaw
    accel = np.tile([0, 0, imu.GRAVITY], (m, 1))
    d, _ = imu.integrate_imu(make_window(stamps, gyro, accel),
                             jnp.zeros(6), imu.ImuState(jnp.zeros(3)))
    np.testing.assert_allclose(float(d[5]), 0.1, atol=5e-3)


def test_imu_constant_accel():
    m = 100
    stamps = np.linspace(0, 0.1, m)
    gyro = np.zeros((m, 3))
    accel = np.tile([2.0, 0, imu.GRAVITY], (m, 1))  # 2 m/s² forward
    d, st = imu.integrate_imu(make_window(stamps, gyro, accel),
                              jnp.zeros(6), imu.ImuState(jnp.zeros(3)))
    # x ≈ ½·a·t² = 0.01 m; v ≈ 0.2 m/s
    np.testing.assert_allclose(float(d[0]), 0.01, atol=2e-3)
    np.testing.assert_allclose(float(st.velocity[0]), 0.2, atol=1e-2)


def test_imu_carries_velocity():
    """Existing velocity propagates position even with zero acceleration."""
    m = 10
    stamps = np.linspace(0, 0.1, m)
    gyro = np.zeros((m, 3))
    accel = np.tile([0, 0, imu.GRAVITY], (m, 1))
    d, _ = imu.integrate_imu(make_window(stamps, gyro, accel),
                             jnp.zeros(6), imu.ImuState(jnp.asarray([1.0, 0, 0])))
    np.testing.assert_allclose(float(d[0]), 0.1, atol=5e-3)


def test_wheel_odom_straight():
    m = 20
    w = imu.OdomWindow(
        stamps=jnp.asarray(np.linspace(0, 0.1, m), jnp.float32),
        linear=jnp.tile(jnp.asarray([[10.0, 0, 0]], jnp.float32), (m, 1)),
        angular=jnp.zeros((m, 3)),
        mask=jnp.ones(m, bool),
    )
    d = imu.integrate_wheel_odom(w, jnp.zeros(6))
    np.testing.assert_allclose(float(d[0]), 1.0, atol=0.01)
    np.testing.assert_allclose(np.asarray(d[1:]), 0.0, atol=1e-4)


def test_wheel_odom_respects_heading():
    m = 20
    w = imu.OdomWindow(
        stamps=jnp.asarray(np.linspace(0, 0.1, m), jnp.float32),
        linear=jnp.tile(jnp.asarray([[10.0, 0, 0]], jnp.float32), (m, 1)),
        angular=jnp.zeros((m, 3)),
        mask=jnp.ones(m, bool),
    )
    pose0 = jnp.asarray([0, 0, 0, 0, 0, np.pi / 2], jnp.float32)
    d = imu.integrate_wheel_odom(w, pose0)
    # heading +90° → motion along +y
    np.testing.assert_allclose(float(d[1]), 1.0, atol=0.01)
    np.testing.assert_allclose(float(d[0]), 0.0, atol=0.01)


def test_combine():
    di = jnp.asarray([9, 9, 9, 0.1, 0.2, 0.3], jnp.float32)
    do = jnp.asarray([1, 2, 3, 9, 9, 9], jnp.float32)
    c = np.asarray(imu.combine_imu_odom(di, do))
    np.testing.assert_allclose(c, [1, 2, 3, 0.1, 0.2, 0.3])


def test_odometry_step_accepts_ext_delta(rng):
    """ext_delta guess must flow through step and still converge."""
    import jax.numpy as jnp
    from tests.test_odometry import SPEC, FCFG
    from xchu_slam_tpu.models import odometry
    from xchu_slam_tpu.ops.filter import filter_scan
    from xchu_slam_tpu.types import make_cloud
    from xchu_slam_tpu.utils import sim

    world = sim.make_world(3, extent=90.0, ground_pts=60_000)
    poses = sim.loop_trajectory(n_scans=40, radius=55.0, speed=1.0)[:3]
    g = np.random.default_rng(3)
    xyz, _ = sim.render_scan(world, poses[0], g, n_points=10_000)
    f = filter_scan(make_cloud(xyz, capacity=FCFG.max_raw_points), FCFG)
    state = odometry.init_state(SPEC, jnp.asarray(poses[0]), f.xyz, f.mask)
    xyz1, _ = sim.render_scan(world, poses[1], g, n_points=10_000)
    f1 = filter_scan(make_cloud(xyz1, capacity=FCFG.max_raw_points), FCFG)
    true_delta = jnp.asarray(poses[1] - poses[0])
    state, out = odometry.step(state, f1.xyz, f1.mask, SPEC,
                               ext_delta=true_delta, use_ext=True)
    err = np.asarray(out.pose) - poses[1]
    assert np.linalg.norm(err[:3]) < 0.1
