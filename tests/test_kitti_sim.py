"""KITTI-trajectory-driven simulation: TUM conversion, corridor world,
spatial index, and the e2e CLI `run-sim --trajectory` path.

The image ships KITTI ground truth but no velodyne data, so the full-sequence
accuracy benchmark simulates scans along the *real* GT trajectory
(`/root/reference/kitti_ground_truth_tum/00.txt`) — these tests validate that
machinery on small synthetic trajectories.
"""

import json
import os

import numpy as np
import pytest

from xchu_slam_tpu.utils import sim


def _rot_zyx(rpy):
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    return np.array([
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr],
    ])


def _mat_to_quat(R):
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return x, y, z, w


def _write_tum_camera_frame(path, poses6):
    """poses6 (z-up body frame) → TUM file in the KITTI camera frame, the
    exact inverse of sim.tum_trajectory_poses's conversion."""
    C = sim._CAM_TO_WORLD
    with open(path, "w") as f:
        for i, p in enumerate(poses6):
            R_w = _rot_zyx(p[3:6])
            p_cam = C.T @ p[:3]
            R_cam = C.T @ R_w @ C
            x, y, z, w = _mat_to_quat(R_cam)
            f.write(f"{0.1*i:.6f} {p_cam[0]:.9f} {p_cam[1]:.9f} "
                    f"{p_cam[2]:.9f} {x:.9f} {y:.9f} {z:.9f} {w:.9f}\n")


def test_tum_trajectory_roundtrip(tmp_path):
    """cam-frame TUM → z-up poses must reproduce the original 6-DoF poses."""
    rng = np.random.default_rng(0)
    n = 40
    poses = np.zeros((n, 6))
    poses[:, :3] = np.cumsum(rng.normal(0, 0.5, (n, 3)), 0)
    poses[:, 3:] = rng.normal(0, 0.3, (n, 3))
    poses[0] = 0.0
    f = str(tmp_path / "gt_tum.txt")
    _write_tum_camera_frame(f, poses)
    stamps, got = sim.tum_trajectory_poses(f)
    np.testing.assert_allclose(stamps, 0.1 * np.arange(n), atol=1e-6)
    np.testing.assert_allclose(got[:, :3], poses[:, :3], atol=1e-5)
    # compare rotations as matrices (euler wrap-around safe)
    for k in range(n):
        np.testing.assert_allclose(_rot_zyx(got[k, 3:6]),
                                   _rot_zyx(poses[k, 3:6]), atol=1e-5)
    s2, got2 = sim.tum_trajectory_poses(f, max_scans=10)
    assert got2.shape == (10, 6) and s2.shape == (10,)


def test_world_index_superset():
    """Index query must return every point within max_range of the sensor."""
    world = sim.make_world(1, extent=80.0, ground_pts=20_000)
    idx = sim.WorldIndex(world, cell=32.0)
    for t in [np.array([0.0, 0.0]), np.array([55.0, -60.0]),
              np.array([-79.0, 79.0])]:
        cand = idx.query(t, 50.0)
        r = np.linalg.norm(world.xyz[:, :2] - t[None], axis=1)
        inside = np.nonzero(r < 50.0)[0]
        assert np.isin(inside, cand).all()
    # indexed render must see the identical candidate geometry: same
    # points-in-range set as the brute-force path
    rng = np.random.default_rng(2)
    pose = np.array([10.0, -5.0, 0, 0, 0, 0.4], np.float32)
    full, _ = sim.render_scan(world, pose, rng, n_points=10 ** 9, noise=0.0)
    rng = np.random.default_rng(2)
    fast, _ = sim.render_scan(world, pose, rng, n_points=10 ** 9, noise=0.0,
                              index=idx)
    assert {tuple(np.round(p, 4)) for p in full} == \
        {tuple(np.round(p, 4)) for p in fast}


def test_make_world_along_corridor():
    """Corridor world: ground hugs the path height profile; buildings stay
    clear of the driving corridor; revisited segments see identical points."""
    s = np.linspace(0, 4 * np.pi, 160)
    path = np.c_[20 * s, 12 * np.sin(s), 0.08 * 20 * s]  # climbing weave
    world = sim.make_world_along(path, seed=3, ground_pts_per=300,
                                 wall_pts_per_face=400)
    assert len(world.xyz) > 30_000
    # ground near the path start sits ~sensor_height below it
    near0 = np.linalg.norm(world.xyz[:, :2] - path[0, :2], axis=1) < 8.0
    low = world.xyz[near0 & (world.xyz[:, 2] < path[0, 2])]
    assert abs(np.median(low[:, 2]) - (path[0, 2] - 1.73)) < 0.5
    # ground near the path end follows the climb
    near1 = np.linalg.norm(world.xyz[:, :2] - path[-1, :2], axis=1) < 8.0
    lowz = world.xyz[near1][:, 2]
    ground1 = np.median(lowz[lowz < path[-1, 2] - 0.5])
    assert abs(ground1 - (path[-1, 2] - 1.73)) < 1.0
    # nothing but ground within the corridor clearance at mid-path
    mid = path[80]
    near = np.linalg.norm(world.xyz[:, :2] - mid[None, :2], axis=1) < 3.0
    tall = world.xyz[near][:, 2] > mid[2] + 1.0
    assert tall.mean() < 0.05


def test_associate_and_eval_keyframe_vs_perscan(tmp_path, capsys):
    """A keyframe trajectory (every 3rd scan) against per-scan GT must be
    timestamp-associated — index-by-index pairing produced 184 m phantom ATE
    on an actually-sub-3m run."""
    from xchu_slam_tpu.cli import main
    from xchu_slam_tpu.utils import metrics

    n = 300
    t = 0.103 * np.arange(n)  # KITTI-like non-round timestamps
    poses = np.zeros((n, 6))
    poses[:, 0] = 1.3 * np.arange(n)
    poses[:, 1] = 5 * np.sin(np.arange(n) / 40)

    ei, gi = metrics.associate(t[::3], t, max_diff=0.01)
    assert np.array_equal(gi, np.arange(0, n, 3))
    assert np.array_equal(ei, np.arange(len(t[::3])))
    # off-grid stamps within tolerance still match
    ei, gi = metrics.associate(t[::3] + 0.004, t, max_diff=0.01)
    assert np.array_equal(gi, np.arange(0, n, 3))
    # beyond tolerance → dropped
    ei, gi = metrics.associate(np.array([t[9] + 0.09]), t, max_diff=0.01)
    assert len(ei) == 0

    gt_file = str(tmp_path / "gt.txt")
    _write_tum_camera_frame_stamps(gt_file, poses, t)
    est_file = str(tmp_path / "est.txt")
    _write_tum_camera_frame_stamps(est_file, poses[::3], t[::3])
    main(["eval", "--est", est_file, "--gt", gt_file])
    out = json.loads(capsys.readouterr().out)
    assert out["pairs"] == len(poses[::3])
    assert out["ape_rmse_m"] < 1e-4, out
    assert out["rpe_rmse_m"] < 1e-4, out


def _write_tum_camera_frame_stamps(path, poses6, stamps):
    C = sim._CAM_TO_WORLD
    with open(path, "w") as f:
        for t, p in zip(stamps, poses6):
            R_w = _rot_zyx(p[3:6])
            p_cam = C.T @ p[:3]
            x, y, z, w = _mat_to_quat(C.T @ R_w @ C)
            f.write(f"{t:.6f} {p_cam[0]:.9f} {p_cam[1]:.9f} "
                    f"{p_cam[2]:.9f} {x:.9f} {y:.9f} {z:.9f} {w:.9f}\n")


def test_cli_run_sim_trajectory(tmp_path, capsys):
    """e2e: simulate along a synthetic TUM GT file (device engine) and check
    accuracy metrics come out finite and small."""
    from xchu_slam_tpu.cli import main

    n = 36
    s = np.linspace(0, 2 * np.pi, n)  # ~1.2 m/scan — KITTI-like step size
    poses = np.zeros((n, 6))
    poses[:, 0] = 7 * np.sin(s)
    poses[:, 1] = 7 * (1 - np.cos(s))
    yaw = np.arctan2(np.gradient(poses[:, 1]), np.gradient(poses[:, 0]))
    poses[:, 5] = np.unwrap(yaw)
    gt_file = str(tmp_path / "gt_tum.txt")
    _write_tum_camera_frame(gt_file, poses)

    out = str(tmp_path / "run")
    main(["run-sim", "--trajectory", gt_file, "--engine", "device",
          "--out", out, "--seed", "4",
          "--set", "filter.max_raw_points=8192",
          "--set", "filter.max_points=4096",
          "--set", "filter.outlier_method=none",
          "--set", "ndt.grid_x=48", "--set", "ndt.grid_y=48",
          "--set", "ndt.grid_z=16",
          "--set", "pgo.max_keyframes=64", "--set", "pgo.max_loops=8"])
    summary = json.loads(capsys.readouterr().out)
    assert summary["scans"] == n
    assert summary["keyframes"] > 2
    assert summary["ate_rmse_m"] < 1.0
    assert summary["rpe_rmse_m"] < 1.0
    assert np.isfinite(summary["drift_pct"])
    for name, pth in summary["artifacts"].items():
        assert os.path.exists(pth), name
    # exported odom_tum is camera-frame: eval CLI against the GT file must
    # agree with the run summary (same association + alignment conventions)
    main(["eval", "--est", summary["artifacts"]["odom_tum"],
          "--gt", gt_file])
    ev = json.loads(capsys.readouterr().out)
    assert ev["pairs"] == summary["keyframes"]
    assert abs(ev["ape_rmse_m"] - summary["ate_rmse_m"]) < 0.05, (ev, summary)


def test_cli_continue_session(tmp_path, capsys):
    """CLI surface of session continuation (run-sim --continue-session):
    map a session with --checkpoint-every, then continue it through the
    CLI — the checkpoint's config must govern the continued run (sensor
    synthesis sees it, CLI --set is ignored with a warning), the chunked
    programs are warmed before the timed stream, and rates divide by the
    scans actually streamed (scan 0 is consumed by the continuation seed)."""
    from xchu_slam_tpu.cli import main

    n = 36
    s = np.linspace(0, 2 * np.pi, n)
    poses = np.zeros((n, 6))
    poses[:, 0] = 7 * np.sin(s)
    poses[:, 1] = 7 * (1 - np.cos(s))
    yaw = np.arctan2(np.gradient(poses[:, 1]), np.gradient(poses[:, 0]))
    poses[:, 5] = np.unwrap(yaw)
    gt_file = str(tmp_path / "gt_tum.txt")
    _write_tum_camera_frame(gt_file, poses)

    tiny = ["--set", "filter.max_raw_points=8192",
            "--set", "filter.max_points=4096",
            "--set", "filter.outlier_method=none",
            "--set", "ndt.grid_x=48", "--set", "ndt.grid_y=48",
            "--set", "ndt.grid_z=16",
            "--set", "pgo.max_keyframes=64", "--set", "pgo.max_loops=8"]
    out1 = str(tmp_path / "session_a")
    main(["run-sim", "--trajectory", gt_file, "--engine", "device",
          "--out", out1, "--seed", "4", "--checkpoint-every", "8"] + tiny)
    s1 = json.loads(capsys.readouterr().out)
    ckpt = os.path.join(out1, "checkpoint.npz")
    assert os.path.exists(ckpt)

    out2 = str(tmp_path / "session_b")
    main(["run-sim", "--trajectory", gt_file, "--engine", "device",
          "--out", out2, "--seed", "4",
          "--continue-session", ckpt] + tiny)
    cap = capsys.readouterr()
    s2 = json.loads(cap.out)
    assert "continuation" in s2
    cont = s2["continuation"]
    assert cont["old_keyframes"] > 2
    assert cont["new_keyframes"] > 2
    assert s2["keyframes"] == cont["old_keyframes"] + cont["new_keyframes"]
    assert np.isfinite(s2["ate_rmse_m"])
    # the checkpoint's config governs: the --set flags provoke the warning
    assert "CHECKPOINT's config" in cap.err
    # rates divide by the n-1 streamed scans, so they can't exceed the
    # per-wall bound computed with the correct denominator
    assert s2["scans_per_sec"] > 0
