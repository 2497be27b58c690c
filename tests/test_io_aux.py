"""Export, checkpoint/resume, CLI, and profiling subsystem tests."""

import json
import os

import numpy as np
import pytest

from xchu_slam_tpu.io import export, kitti
from xchu_slam_tpu.utils import profiling


def test_pcd_roundtrip(tmp_path, rng):
    pts = rng.normal(0, 10, (500, 3)).astype(np.float32)
    p = str(tmp_path / "a.pcd")
    export.write_pcd(p, pts, binary=True)
    back = export.read_pcd(p)
    np.testing.assert_allclose(back, pts, atol=1e-5)
    p2 = str(tmp_path / "b.pcd")
    export.write_pcd(p2, pts, binary=False)
    np.testing.assert_allclose(export.read_pcd(p2), pts, atol=1e-4)


def test_g2o_has_edges(tmp_path, rng):
    n = 10
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n)
    between = np.tile(np.eye(4), (n, 1, 1))
    between[:, 0, 3] = 1.0
    Z = np.eye(4)
    p = str(tmp_path / "g.g2o")
    export.write_g2o(p, poses, between, [(0, 9, Z, 5.0)])
    text = open(p).read()
    assert text.count("VERTEX_SE3:QUAT") == n
    # n-1 odometry edges + 1 loop edge — unlike the reference's empty export
    assert text.count("EDGE_SE3:QUAT") == n


def test_velodyne_bin_roundtrip(tmp_path, rng):
    pts = rng.normal(0, 10, (100, 4)).astype(np.float32)
    p = str(tmp_path / "000000.bin")
    pts.tofile(p)
    back = kitti.read_velodyne_bin(p)
    np.testing.assert_allclose(back, pts)


def test_kitti_pose_io(tmp_path, rng):
    poses = np.tile(np.eye(4), (5, 1, 1))
    poses[:, :3, 3] = rng.normal(0, 10, (5, 3))
    p = str(tmp_path / "p.txt")
    with open(p, "w") as f:
        for T in poses:
            f.write(" ".join(f"{v:.9f}" for v in T[:3].reshape(-1)) + "\n")
    back = kitti.read_kitti_poses(p)
    np.testing.assert_allclose(back, poses, atol=1e-6)


def test_stage_timers():
    t = profiling.StageTimers()
    with t.time("a"):
        pass
    with t.time("a"):
        pass
    assert t.count["a"] == 2
    assert "a" in t.report()


@pytest.fixture(scope="module")
def tiny_pipe():
    """A minimal 12-scan pipeline run for export/checkpoint tests."""
    from xchu_slam_tpu.config import FilterConfig, NdtConfig, PgoConfig, SlamConfig
    from xchu_slam_tpu.models.pipeline import SlamPipeline
    from xchu_slam_tpu.utils import sim

    cfg = SlamConfig(
        filter=FilterConfig(max_raw_points=8192, max_points=4096,
                            outlier_method="none"),
        ndt=NdtConfig(grid_x=48, grid_y=48, grid_z=16, max_iterations=20),
        pgo=PgoConfig(max_keyframes=64, max_loops=8),
    )
    pipe = SlamPipeline(cfg, kf_points=2048)
    world = sim.make_world(3, extent=70.0, ground_pts=40_000)
    gt = sim.loop_trajectory(n_scans=12, radius=30.0, speed=1.0)
    rng = np.random.default_rng(3)
    for i, p in enumerate(gt):
        xyz, inten = sim.render_scan(world, p, rng, n_points=6000)
        pipe.process_scan(xyz, inten, stamp=0.1 * i)
    return pipe


def test_save_run_artifacts(tiny_pipe, tmp_path):
    paths = export.save_run(tiny_pipe, str(tmp_path / "run"))
    for name, p in paths.items():
        assert os.path.exists(p), name
    stamps, poses = kitti.read_tum(paths["odom_tum"])
    assert len(stamps) == int(tiny_pipe.db.count)
    g2o = open(paths["g2o"]).read()
    assert g2o.count("EDGE_SE3:QUAT") >= int(tiny_pipe.db.count) - 1
    # rendered overview (the reference's rviz view as a static artifact):
    # a real PNG with content
    assert "map_png" in paths
    with open(paths["map_png"], "rb") as f:
        head = f.read(8)
    assert head == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(paths["map_png"]) > 10_000


def test_checkpoint_resume(tiny_pipe, tmp_path):
    from xchu_slam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(tiny_pipe, p)
    restored = load_checkpoint(p)
    assert int(restored.db.count) == int(tiny_pipe.db.count)
    np.testing.assert_allclose(np.asarray(restored.db.poses),
                               np.asarray(tiny_pipe.db.poses))
    assert restored.scan_count == tiny_pipe.scan_count
    # restored pipeline must continue processing scans
    from xchu_slam_tpu.utils import sim
    world = sim.make_world(3, extent=70.0, ground_pts=40_000)
    gt = sim.loop_trajectory(n_scans=14, radius=30.0, speed=1.0)
    rng = np.random.default_rng(99)
    xyz, inten = sim.render_scan(world, gt[12], rng, n_points=6000)
    out = restored.process_scan(xyz, inten, stamp=1.2)
    assert np.isfinite(out["pose"]).all()


@pytest.fixture(scope="module")
def tiny_dev_pipe():
    """A minimal on-device pipeline run (chunked ingest) for checkpoint tests."""
    from xchu_slam_tpu.config import FilterConfig, NdtConfig, PgoConfig, SlamConfig
    from xchu_slam_tpu.io.prefetch import DeviceChunkPrefetcher
    from xchu_slam_tpu.models.device_pipeline import DeviceSlamPipeline
    from xchu_slam_tpu.utils import sim

    cfg = SlamConfig(
        filter=FilterConfig(max_raw_points=8192, max_points=4096,
                            outlier_method="none"),
        ndt=NdtConfig(grid_x=48, grid_y=48, grid_z=16, max_iterations=20),
        pgo=PgoConfig(max_keyframes=64, max_loops=8),
    )
    pipe = DeviceSlamPipeline(cfg, kf_points=2048, log_capacity=64)
    world = sim.make_world(3, extent=70.0, ground_pts=40_000)
    gt = sim.loop_trajectory(n_scans=12, radius=30.0, speed=1.0)
    rng = np.random.default_rng(3)
    scans = [sim.render_scan(world, p, rng, n_points=6000) for p in gt]
    pf = DeviceChunkPrefetcher(scans, capacity=8192, chunk=4, depth=2,
                               threads=1)
    base = 0
    for clouds, n_real in pf:
        pipe.process_chunk(clouds, 0.1 * (base + np.arange(4)), n_real)
        base += n_real
    return pipe, scans


def test_device_checkpoint_resume(tiny_dev_pipe, tmp_path):
    from xchu_slam_tpu.models.device_pipeline import DeviceSlamPipeline
    from xchu_slam_tpu.types import make_cloud
    from xchu_slam_tpu.utils import sim
    from xchu_slam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    pipe, scans = tiny_dev_pipe
    p = str(tmp_path / "dev_ckpt.npz")
    save_checkpoint(pipe, p)
    restored = load_checkpoint(p)
    assert isinstance(restored, DeviceSlamPipeline)
    np.testing.assert_array_equal(np.asarray(restored.state.db.poses),
                                  np.asarray(pipe.state.db.poses))
    assert int(np.asarray(restored.state.scan_count)) == \
        int(np.asarray(pipe.state.scan_count))
    # restored pipeline continues processing and finalizes cleanly
    world = sim.make_world(3, extent=70.0, ground_pts=40_000)
    gt = sim.loop_trajectory(n_scans=14, radius=30.0, speed=1.0)
    rng = np.random.default_rng(99)
    xyz, inten = sim.render_scan(world, gt[12], rng, n_points=6000)
    restored.process_scan(make_cloud(xyz, inten, capacity=8192), stamp=1.2)
    restored.finalize()
    assert restored.scan_count == len(scans) + 1
    assert np.isfinite(restored.odometry_trajectory()).all()


def test_cli_run_sim_device_engine(tmp_path, capsys):
    """CLI smoke: the on-device engine end to end (render→chunk→SLAM→export)."""
    from xchu_slam_tpu.cli import main

    out = str(tmp_path / "run")
    main(["run-sim", "--scans", "18", "--radius", "12", "--seed", "5",
          "--engine", "device", "--out", out,
          "--set", "filter.max_raw_points=8192",
          "--set", "filter.max_points=4096",
          "--set", "filter.outlier_method=none",
          "--set", "ndt.grid_x=48", "--set", "ndt.grid_y=48",
          "--set", "ndt.grid_z=16",
          "--set", "pgo.max_keyframes=64", "--set", "pgo.max_loops=8"])
    summary = json.loads(capsys.readouterr().out)
    assert summary["scans"] == 18
    assert summary["keyframes"] > 2
    assert summary["ate_rmse_m"] < 1.0
    for name, pth in summary["artifacts"].items():
        assert os.path.exists(pth), name


@pytest.mark.parametrize("engine", ["host", "device"])
def test_cli_run_kitti_end_to_end(tmp_path, capsys, engine):
    """CLI run-kitti on synthetic velodyne .bin files: native/NumPy loader →
    (chunked) ingest → SLAM → camera-frame export → GT evaluation."""
    import jax.numpy as jnp

    from xchu_slam_tpu.cli import main
    from xchu_slam_tpu.utils import se3, sim

    world = sim.make_world(3, extent=70.0, ground_pts=40_000)
    gt = sim.loop_trajectory(n_scans=18, radius=12.0, speed=1.0)
    rng_ = np.random.default_rng(7)
    vdir = tmp_path / "velodyne"
    vdir.mkdir()
    for i, p in enumerate(gt):
        xyz, inten = sim.render_scan(world, p, rng_, n_points=6000)
        np.c_[xyz, inten].astype(np.float32).tofile(str(vdir / f"{i:06d}.bin"))
    # KITTI-format GT (per scan, camera frame — mirrors the exporter)
    gtT = kitti.velo_to_cam(np.asarray(se3.pose_to_matrix(jnp.asarray(gt))))
    gt_file = str(tmp_path / "gt.txt")
    with open(gt_file, "w") as f:
        for T in gtT:
            f.write(" ".join(f"{v:.9f}" for v in T[:3].reshape(-1)) + "\n")

    out = str(tmp_path / f"run_{engine}")
    main(["run-kitti", "--velodyne-dir", str(vdir), "--gt", gt_file,
          "--out", out, "--engine", engine,
          "--set", "filter.max_raw_points=8192",
          "--set", "filter.max_points=4096",
          "--set", "filter.outlier_method=none",
          "--set", "ndt.grid_x=48", "--set", "ndt.grid_y=48",
          "--set", "ndt.grid_z=16",
          "--set", "pgo.max_keyframes=64", "--set", "pgo.max_loops=8"])
    summary = json.loads(capsys.readouterr().out)
    assert summary["scans"] == 18
    assert summary["keyframes"] > 2
    assert summary["ate_rmse_m"] < 1.0
    for name, pth in summary["artifacts"].items():
        assert os.path.exists(pth), name


def test_cli_eval(tmp_path, rng, capsys):
    from xchu_slam_tpu.cli import main

    poses = np.tile(np.eye(4), (20, 1, 1))
    poses[:, 0, 3] = np.arange(20.0)
    est = poses.copy()
    est[:, :3, 3] += rng.normal(0, 0.05, (20, 3))
    kitti.write_tum(str(tmp_path / "gt.txt"), np.arange(20.0), poses)
    kitti.write_tum(str(tmp_path / "est.txt"), np.arange(20.0), est)
    main(["eval", "--est", str(tmp_path / "est.txt"),
          "--gt", str(tmp_path / "gt.txt")])
    out = json.loads(capsys.readouterr().out)
    assert 0.0 < out["ape_rmse_m"] < 0.2


def test_closed_lap_trajectory_cycles_seamlessly():
    """closed_lap_trajectory: exactly n uniformly spaced poses on a closed
    lap, with the WRAP step (pose n-1 -> pose 0) equal to the in-lap step —
    the property bench.py relies on to replay laps back-to-back without a
    pose discontinuity."""
    from xchu_slam_tpu.utils import sim

    gt = sim.closed_lap_trajectory(n_scans=200, radius=40.0)
    assert gt.shape == (200, 6)
    xy = gt[:, :2]
    steps = np.linalg.norm(np.diff(xy, axis=0), axis=1)
    wrap = np.linalg.norm(xy[0] - xy[-1])
    mean_step = steps.mean()
    assert abs(wrap - mean_step) < 0.25 * mean_step, (wrap, mean_step)
    assert steps.max() < 1.5 * mean_step and steps.min() > 0.5 * mean_step
    # heading is continuous across the wrap too (mod 2pi)
    dyaw = np.arctan2(np.sin(gt[0, 5] - gt[-1, 5]),
                      np.cos(gt[0, 5] - gt[-1, 5]))
    assert abs(dyaw) < 0.3


def test_checkpoint_legacy_layout_migrates(tiny_dev_pipe, tmp_path):
    """Checkpoints saved before the packed-fin VoxelGrid layout (separate
    mean/icov/valid tables, no DevState.last_stamp) must still load: the old
    fields are exactly reconstructible into fin, and last_stamp is seeded
    from the newest logged stamp (NOT 0.0 — a zero seed makes the first
    post-resume IMU velocity reset divide by the absolute stamp, ADVICE r3).
    Unknown missing keys must raise a CLEAR error, not a KeyError."""
    import numpy as np
    import pytest

    from xchu_slam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    pipe, _scans = tiny_dev_pipe
    path = tmp_path / "new.npz"
    save_checkpoint(pipe, str(path))

    data = dict(np.load(str(path)).items())
    legacy = {}
    for k, v in data.items():
        if k.endswith(".fin"):
            p = k[: -len(".fin")]
            legacy[f"{p}.mean"] = v[:, 0:3]
            legacy[f"{p}.icov"] = v[:, 3:9]
            legacy[f"{p}.valid"] = v[:, 9] > 0.0
        elif k == "state.last_stamp":
            pass
        else:
            legacy[k] = v
    legacy_path = tmp_path / "legacy.npz"
    np.savez_compressed(str(legacy_path), **legacy)

    restored = load_checkpoint(str(legacy_path))
    ref = load_checkpoint(str(path))
    np.testing.assert_array_equal(
        np.asarray(restored.state.odom.grid_a.fin),
        np.asarray(ref.state.odom.grid_a.fin))
    np.testing.assert_array_equal(np.asarray(restored.state.db.poses),
                                  np.asarray(ref.state.db.poses))
    log = np.asarray(ref.state.log)
    n = int(np.asarray(ref.state.scan_count))
    want_stamp = float(log[:min(n, log.shape[0]), 10].max())
    assert float(restored.state.last_stamp) == want_stamp
    assert want_stamp > 0.0

    # truly incompatible checkpoint → clear error naming the missing key
    broken = {k: v for k, v in legacy.items()
              if not k.startswith("state.db.poses")}
    broken_path = tmp_path / "broken.npz"
    np.savez_compressed(str(broken_path), **broken)
    with pytest.raises(ValueError, match="incompatible"):
        load_checkpoint(str(broken_path))
