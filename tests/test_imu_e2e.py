"""End-to-end IMU / wheel-odometry guess path (reference use_imu/use_odom
launch modes, odom_node.cpp:237-254,494-663): sim sensor synthesis →
per-scan windows → ON-DEVICE integration into the NDT initial guess — through
the device engine's per-scan and chunked entry points.

The payoff test mirrors why the reference has ImuCalc at all: under
aggressive rotation the constant-velocity guess mispredicts heading, costing
Newton iterations (or tracking); the gyro-integrated guess is near-exact.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xchu_slam_tpu.config import default_config
from xchu_slam_tpu.models import device_pipeline as dp
from xchu_slam_tpu.ops import imu as imu_ops
from xchu_slam_tpu.types import make_cloud
from xchu_slam_tpu.utils import metrics, sim


def _cfg(**over):
    base = {
        "filter.max_raw_points": 4096,
        "filter.max_points": 2048,
        "filter.outlier_method": "none",
        "ndt.grid_x": 48, "ndt.grid_y": 48, "ndt.grid_z": 16,
        "pgo.max_keyframes": 64, "pgo.max_loops": 8,
        "loop.method": "none",
        "loop.submap_half_width": 4, "loop.submap_points": 2048,
    }
    base.update(over)
    return default_config().override(base)


def _zigzag_trajectory(n=36, step=1.0):
    """Aggressive-rotation path: heading oscillates ±0.8 rad scan to scan, so
    the constant-velocity guess (yesterday's delta) is systematically wrong
    about today's rotation."""
    yaw = 0.8 * np.sin(np.arange(n) * 1.3)
    gt = np.zeros((n, 6), np.float32)
    for i in range(1, n):
        gt[i, 0] = gt[i - 1, 0] + step * np.cos(yaw[i])
        gt[i, 1] = gt[i - 1, 1] + step * np.sin(yaw[i])
    gt[:, 5] = yaw
    return gt


def _imu_window(arrs, i):
    ws, wg, wa, wm = arrs
    return imu_ops.ImuWindow(jnp.asarray(ws[i]), jnp.asarray(wg[i]),
                             jnp.asarray(wa[i]), jnp.asarray(wm[i]))


def _wheel_window(arrs, i):
    ws, wl, wn, wm = arrs
    return imu_ops.OdomWindow(jnp.asarray(ws[i]), jnp.asarray(wl[i]),
                              jnp.asarray(wn[i]), jnp.asarray(wm[i]))


def test_sim_windows_match_integrators():
    """sim.imu_windows / wheel_windows must reproduce the trajectory deltas
    through ops.imu's integrators: rotation near-exactly (euler-rate model),
    translation to cm (the reference's crude double integration)."""
    gt = sim.loop_trajectory(n_scans=50, radius=10.0, speed=1.5)
    gt[:, 2] = 0.3 * np.sin(np.arange(50) * 0.3)
    stamps = 0.1 * np.arange(50)
    imu_arrs = sim.imu_windows(gt, stamps, samples=16)
    st = imu_ops.ImuState(velocity=jnp.asarray(
        (gt[1, :3] - gt[0, :3]) / 0.1, jnp.float32))
    for i in range(1, 50):
        delta, st = imu_ops.integrate_imu(
            _imu_window(imu_arrs, i), jnp.asarray(gt[i - 1], jnp.float32), st)
        d = np.asarray(delta)
        true = gt[i] - gt[i - 1]
        assert np.linalg.norm(d[:3] - true[:3]) < 0.05
        dr = np.arctan2(np.sin(d[3:] - true[3:]), np.cos(d[3:] - true[3:]))
        assert np.linalg.norm(dr) < 1e-4

    wheel_arrs = sim.wheel_windows(gt, stamps, samples=16)
    for i in range(1, 50):
        delta = imu_ops.integrate_wheel_odom(
            _wheel_window(wheel_arrs, i), jnp.asarray(gt[i - 1], jnp.float32))
        d = np.asarray(delta)
        assert np.linalg.norm(d[:3] - (gt[i, :3] - gt[i - 1, :3])) < 0.05


@pytest.fixture(scope="module")
def zigzag_scans():
    gt = _zigzag_trajectory()
    world = sim.make_world(4, extent=50.0, ground_pts=30000)
    rng = np.random.default_rng(9)
    scans = [sim.render_scan(world, p, rng, n_points=3000) for p in gt]
    return gt, scans


def _run(cfg, gt, scans, imu_arrs=None, wheel_arrs=None):
    pipe = dp.DeviceSlamPipeline(cfg, kf_points=1024, log_capacity=64)
    for i, (xyz, inten) in enumerate(scans):
        cl = make_cloud(xyz, inten, capacity=cfg.filter.max_raw_points)
        pipe.process_scan(
            cl, stamp=0.1 * i,
            imu=_imu_window(imu_arrs, i) if imu_arrs else None,
            wheel=_wheel_window(wheel_arrs, i) if wheel_arrs else None)
    pipe.finalize()
    traj = pipe.odometry_trajectory()
    iters = np.array([r["iterations"] for r in pipe.odom_log[1:]])
    ate = metrics.ape_rmse(traj[:, :3], gt[: len(traj), :3], align=False)
    return ate, iters, pipe


def test_imu_guess_beats_const_velocity_under_aggressive_rotation(zigzag_scans):
    gt, scans = zigzag_scans
    stamps = 0.1 * np.arange(len(gt))
    rng = np.random.default_rng(2)
    imu_arrs = sim.imu_windows(gt, stamps, samples=16, rng=rng,
                               gyro_noise=0.002, accel_noise=0.05)

    ate_cv, iters_cv, _ = _run(_cfg(), gt, scans)
    ate_imu, iters_imu, _ = _run(_cfg(**{"odom.use_imu": True}), gt, scans,
                                 imu_arrs=imu_arrs)
    # the gyro guess must save Newton work AND not hurt accuracy
    assert iters_imu.mean() < iters_cv.mean(), \
        f"imu {iters_imu.mean():.2f} vs cv {iters_cv.mean():.2f} iters"
    assert ate_imu < max(1.05 * ate_cv, ate_cv + 0.02), (ate_imu, ate_cv)


def test_wheel_and_combined_modes_track(zigzag_scans):
    gt, scans = zigzag_scans
    stamps = 0.1 * np.arange(len(gt))
    rng = np.random.default_rng(3)
    imu_arrs = sim.imu_windows(gt, stamps, samples=16, rng=rng,
                               gyro_noise=0.002, accel_noise=0.05)
    wheel_arrs = sim.wheel_windows(gt, stamps, samples=16, rng=rng,
                                   vel_noise=0.03, gyro_noise=0.002)

    ate_w, _, _ = _run(_cfg(**{"odom.use_odom": True}), gt, scans,
                       wheel_arrs=wheel_arrs)
    assert ate_w < 1.0
    # ImuOdomCalc: wheel translation + IMU rotation (odom_node.cpp:629-663)
    ate_b, _, _ = _run(
        _cfg(**{"odom.use_imu": True, "odom.use_odom": True}), gt, scans,
        imu_arrs=imu_arrs, wheel_arrs=wheel_arrs)
    assert ate_b < 1.0


def test_imu_velocity_resets_from_slam_delta(zigzag_scans):
    """The IMU velocity estimate must be re-anchored to the SLAM pose delta
    every scan (reference odom_node.cpp:312-317): with a constant accel bias,
    pure double integration random-walks the velocity (verr = b·t — 1.4 m/s
    by the end of this run) while the reset bounds the error to one scan's
    bias integral. Asserted on BOTH engines: the carried velocity must equal
    the final inter-scan SLAM delta, not the integrated value."""
    gt, scans = zigzag_scans
    stamps = 0.1 * np.arange(len(gt))
    rng = np.random.default_rng(4)
    ws, wg, wa, wm = sim.imu_windows(gt, stamps, samples=16, rng=rng,
                                     gyro_noise=0.002, accel_noise=0.05)
    wa = wa + np.array([0.4, 0.0, 0.0])  # constant accelerometer bias
    imu_arrs = (ws, wg, wa, wm)
    cfg = _cfg(**{"odom.use_imu": True})

    ate, _, pipe = _run(cfg, gt, scans, imu_arrs=imu_arrs)
    traj = pipe.odometry_trajectory()
    want_vel = (traj[-1, :3] - traj[-2, :3]) / 0.1
    got_vel = np.asarray(pipe.state.imu_vel)
    np.testing.assert_allclose(got_vel, want_vel, atol=1e-3)
    # the biased feed must not wreck tracking (reset keeps the guess sane;
    # without it verr = 0.4·t ≈ 1.4 m/s by the run's end and grows unbounded)
    assert ate < 2.5

    from xchu_slam_tpu.models.pipeline import SlamPipeline
    host = SlamPipeline(cfg, kf_points=1024)
    for i, (xyz, inten) in enumerate(scans):
        host.process_scan(xyz, inten, stamp=0.1 * i,
                          imu=_imu_window(imu_arrs, i))
    htraj = host.odometry_trajectory()
    hwant = (htraj[-1, :3] - htraj[-2, :3]) / 0.1
    np.testing.assert_allclose(np.asarray(host._imu_state.velocity), hwant,
                               atol=1e-3)


def test_chunked_wins_match_per_scan(zigzag_scans):
    """device_chunk_step with stacked GuessWindows must reproduce the
    per-scan IMU path exactly (same programs, scanned)."""
    gt, scans = zigzag_scans
    gt, scans = gt[:20], scans[:20]
    stamps = 0.1 * np.arange(len(gt))
    imu_arrs = sim.imu_windows(gt, stamps, samples=16)
    cfg = _cfg(**{"odom.use_imu": True})

    _, _, ref = _run(cfg, gt, scans, imu_arrs=imu_arrs)

    pipe = dp.DeviceSlamPipeline(cfg, kf_points=1024, log_capacity=64)
    chunk = 8
    ws, wg, wa, wm = imu_arrs
    base = 0
    while base < len(scans):
        n_real = min(chunk, len(scans) - base)
        idx = np.minimum(base + np.arange(chunk), len(scans) - 1)
        clouds = [make_cloud(*scans[j], capacity=cfg.filter.max_raw_points)
                  for j in idx]
        import jax
        batch = jax.tree.map(lambda *a: jnp.stack(a), *clouds)
        wins = dp.GuessWindows(
            imu=imu_ops.ImuWindow(jnp.asarray(ws[idx]), jnp.asarray(wg[idx]),
                                  jnp.asarray(wa[idx]), jnp.asarray(wm[idx])),
            wheel=None)
        pipe.process_chunk(batch, stamps[idx], n_real, wins=wins)
        base += n_real
    pipe.finalize()

    np.testing.assert_array_equal(pipe.odometry_trajectory(),
                                  ref.odometry_trajectory())
    assert pipe.kf_count == ref.kf_count
