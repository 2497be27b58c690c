"""Tests for the parity-completion modules: GICP, keyframe localmaps,
multi-session SC, ISC RGB, markers, native loader, distributed helper."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from xchu_slam_tpu.ops import gicp, isc as isc_ops, scancontext as sc, voxel_map as vm
from xchu_slam_tpu.models import localmap_keyframes as lk
from xchu_slam_tpu.utils import se3, sim

GSPEC = vm.GridSpec(gx=48, gy=48, gz=16, resolution=2.0, min_points=6,
                    eig_inflation=0.01)


def test_gicp_recovers_pose(rng):
    from tests.test_ndt import make_world, build_grid
    world = make_world(rng)
    grid = build_grid(world)
    true_pose = np.array([0.3, -0.2, 0.0, 0.0, 0.0, 0.03], np.float32)
    T = np.asarray(se3.pose_to_matrix(jnp.asarray(true_pose)))
    sel = world[rng.choice(len(world), 2000, replace=False)]
    src = (np.linalg.inv(T)[:3, :3] @ sel.T).T + np.linalg.inv(T)[:3, 3]
    res = gicp.align(jnp.asarray(src.astype(np.float32)), jnp.ones(2000, bool),
                     grid, jnp.zeros(6), GSPEC,
                     gicp.GicpSpec(max_iterations=40))
    pose = np.asarray(res.pose)
    np.testing.assert_allclose(pose[:2], true_pose[:2], atol=0.1)
    np.testing.assert_allclose(pose[5], true_pose[5], atol=0.02)


def test_window_localmap(rng):
    K, P = 16, 1024
    clouds = np.zeros((K, P, 3), np.float32)
    masks = np.zeros((K, P), bool)
    poses = np.zeros((K, 6), np.float32)
    for k in range(6):
        clouds[k] = rng.uniform(-10, 10, (P, 3))
        masks[k] = True
        poses[k, 0] = 2.0 * k
    grid = lk.build_window_localmap(
        jnp.asarray(clouds), jnp.asarray(masks), jnp.asarray(poses),
        jnp.int32(6), jnp.asarray(poses[5, :3]), GSPEC, window=4)
    assert float(jnp.sum(grid.n)) == 4 * P  # last 4 keyframes only


def test_distance_localmap(rng):
    K, P = 16, 512
    clouds = np.tile(rng.uniform(-5, 5, (1, P, 3)).astype(np.float32), (K, 1, 1))
    masks = np.ones((K, P), bool)
    poses = np.zeros((K, 6), np.float32)
    poses[:, 0] = np.arange(K) * 10.0  # far apart
    grid = lk.build_distance_localmap(
        jnp.asarray(clouds), jnp.asarray(masks), jnp.asarray(poses),
        jnp.int32(K), jnp.asarray(poses[K - 1, :3]), GSPEC,
        radius=25.0, max_window=K)
    # only keyframes within 25 m of the last pose contribute (3 of them)
    assert float(jnp.sum(grid.n)) == 3 * P


def test_sc_between_sessions(rng):
    world = sim.make_world(2, extent=90.0)
    g = np.random.default_rng(1)
    spec = sc.ScSpec()
    K = 64
    db = np.zeros((K, spec.num_ring, spec.num_sector), np.float32)
    for i in range(40):
        p = np.array([25 * np.cos(i), 25 * np.sin(1.7 * i), 0, 0, 0, 0.3 * i],
                     np.float32)
        xyz, _ = sim.render_scan(world, p, g, n_points=6000)
        db[i] = np.asarray(sc.make_descriptor(jnp.asarray(xyz),
                                              jnp.ones(len(xyz), bool), spec))
    # "other session" query at the place of index 38 — RECENT, but the
    # between-session search has no recency exclusion
    p38 = np.array([25 * np.cos(38), 25 * np.sin(1.7 * 38), 0, 0, 0,
                    0.3 * 38 + 0.5], np.float32)
    xyz, _ = sim.render_scan(world, p38, g, n_points=6000)
    q = sc.make_descriptor(jnp.asarray(xyz), jnp.ones(len(xyz), bool), spec)
    res = sc.detect_loop_between_sessions(q, jnp.asarray(db), jnp.int32(40), spec)
    assert bool(res.found)
    assert int(res.idx) == 38
    # the in-session search must NOT find it (recency exclusion)
    res2 = sc.detect_loop(q, jnp.asarray(db), jnp.int32(40), spec)
    assert int(res2.idx) != 38


def test_ring_key_topk(rng):
    keys = rng.normal(0, 1, (32, 20)).astype(np.float32)
    q = keys[7] + rng.normal(0, 0.01, 20).astype(np.float32)
    idx, d = sc.ring_key_topk(jnp.asarray(q), jnp.asarray(keys),
                              jnp.ones(32, bool), k=3)
    assert int(idx[0]) == 7


def test_isc_rgb(rng):
    desc = jnp.asarray(rng.uniform(0, 1, (60, 60)).astype(np.float32))
    img = isc_ops.isc_rgb(desc)
    assert img.shape == (60, 60, 3)
    assert img.dtype == jnp.uint8


def test_markers_export(tmp_path):
    from xchu_slam_tpu.io.export import write_markers
    poses = np.tile(np.eye(4), (5, 1, 1))
    write_markers(str(tmp_path / "m.json"), poses, [(0, 4)])
    m = json.load(open(tmp_path / "m.json"))
    assert len(m["nodes"]) == 5
    assert len(m["odometry_edges"]) == 4
    assert m["loop_edges"] == [{"i": 0, "j": 4}]


def test_native_loader(tmp_path, rng):
    from xchu_slam_tpu.io import native_loader as nl
    if not nl.available():
        pytest.skip("native toolchain unavailable")
    pts = rng.normal(0, 20, (3000, 4)).astype(np.float32)
    pts[::50] = np.nan
    p = str(tmp_path / "000000.bin")
    pts.tofile(p)
    xyz, inten, n = nl.read_velodyne(p, 4096, min_range=1.0, max_range=60.0)
    assert 0 < n < 3000
    assert np.isfinite(xyz).all()
    assert np.abs(xyz[n:]).sum() == 0.0
    # oracle: numpy path must agree on the count
    raw = pts[np.isfinite(pts).all(axis=1)]
    r2 = raw[:, 0] ** 2 + raw[:, 1] ** 2
    expected = ((r2 > 1.0) & (r2 < 3600.0)).sum()
    assert n == expected


def test_native_prefetcher(tmp_path, rng):
    from xchu_slam_tpu.io import native_loader as nl
    if not nl.available():
        pytest.skip("native toolchain unavailable")
    files = []
    for i in range(5):
        pts = rng.normal(0, 20, (2000, 4)).astype(np.float32)
        p = str(tmp_path / f"{i:06d}.bin")
        pts.tofile(p)
        files.append(p)
    pf = nl.ScanPrefetcher(files, 4096)
    counts = [pf.get(i)[2] for i in range(5)]
    pf.close()
    assert all(c > 0 for c in counts)


def test_distributed_helper_single_host():
    from xchu_slam_tpu.parallel import distributed
    distributed.initialize()  # no coordinator → no-op
    t = distributed.topology()
    assert t["process_count"] >= 1
    mesh = distributed.global_mesh()
    assert mesh.devices.size >= 1


def test_async_pipeline_finds_loops():
    """Async worker mode must find the same loops as the sync path."""
    from tests.test_pipeline import small_cfg
    from xchu_slam_tpu.models.pipeline import SlamPipeline

    cfg = small_cfg()
    cfg = cfg.override({"loop.async_detect": True})
    pipe = SlamPipeline(cfg, kf_points=4096)
    world = sim.make_world(21, extent=70.0, ground_pts=80_000)
    gt = sim.loop_trajectory(n_scans=215, radius=25.0, speed=1.0)
    g = np.random.default_rng(21)
    for i, p in enumerate(gt):
        xyz, inten = sim.render_scan(world, p, g, n_points=12_000, max_range=50.0)
        pipe.process_scan(xyz, inten, stamp=0.1 * i)
    pipe.finalize()
    assert pipe.loop_count >= 1
    for rec in pipe.loops:
        assert rec.j - rec.i > 10
