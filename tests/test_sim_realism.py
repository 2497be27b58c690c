"""Beam-level sensor realism (utils.sim.SensorModel / DynamicObjects —
VERDICT r4 item 5): 64-beam elevation quantization, per-ray occlusion,
range/reflectivity dropout, radial noise, moving objects — and the SLAM
engine surviving all of it end to end."""

import numpy as np
import pytest

from xchu_slam_tpu.utils import sim


def _flat_world(n_near: int = 300_000, n_far: int = 60_000):
    """A wall at y=10 plus a far wall at y=30, both facing the origin. The
    near wall is sampled densely: the z-buffer occlusion is only as tight as
    the occluder's surface sampling (rays leak through un-sampled bins)."""
    rng = np.random.default_rng(3)
    near = np.c_[rng.uniform(-20, 20, n_near), np.full(n_near, 10.0),
                 rng.uniform(-1.5, 6.0, n_near)]
    far = np.c_[rng.uniform(-20, 20, n_far), np.full(n_far, 30.0),
                rng.uniform(-1.5, 6.0, n_far)]
    xyz = np.vstack([near, far]).astype(np.float32)
    inten = np.concatenate([np.full(n_near, 0.8, np.float32),
                            np.full(n_far, 0.8, np.float32)])
    return sim.World(xyz=xyz, intensity=inten)


def test_beam_pattern_quantizes_elevation(rng):
    world = _flat_world()
    sm = sim.SensorModel(occlusion=False, dropout_base=0.0,
                         dropout_range=0.0, dropout_dark=0.0,
                         noise_floor=0.0, noise_per_m=0.0)
    xyz, _ = sim.render_scan(world, np.zeros(6), rng, sensor=sm,
                             n_points=30_000)
    assert len(xyz) > 1000
    r_xy = np.linalg.norm(xyz[:, :2], axis=1)
    elev = np.arctan2(xyz[:, 2], r_xy)
    d_el = (sm.elev_max - sm.elev_min) / (sm.n_beams - 1)
    frac = (elev - sm.elev_min) / d_el
    # every return sits within beam_tol of a discrete beam
    assert np.all(np.abs(frac - np.round(frac)) <= sm.beam_tol + 1e-4)
    # and a healthy number of distinct beams is populated
    assert len(np.unique(np.round(frac).astype(int))) >= 20


def test_occlusion_blocks_far_wall(rng):
    """The near wall (y=10, z up to 6 → elevation 31° ≫ the +2° beam cap)
    shadows every beam toward the far wall (y=30) in its azimuth sector, so
    with per-ray occlusion far returns there should (almost) vanish. A
    point-sampled world leaks a few rays through un-sampled (az, beam) bins,
    so the assertion is a strong reduction, not zero."""
    world = _flat_world()
    kw = dict(dropout_base=0.0, dropout_range=0.0, dropout_dark=0.0)

    def far_in_sector(occlusion):
        sm = sim.SensorModel(occlusion=occlusion, **kw)
        xyz, _ = sim.render_scan(world, np.zeros(6), rng, sensor=sm,
                                 n_points=100_000)
        sector = np.abs(np.degrees(np.arctan2(xyz[:, 0], xyz[:, 1]))) < 30
        return int((sector & (xyz[:, 1] > 20)).sum())

    n_occ = far_in_sector(True)
    n_no = far_in_sector(False)
    assert n_no > 500, f"far wall not visible even without occlusion ({n_no})"
    assert n_occ < 0.15 * n_no, (n_occ, n_no)


def test_range_dropout_thins_far_returns(rng):
    world = _flat_world()
    kw = dict(occlusion=False, dropout_base=0.0, dropout_dark=0.0)
    off = sim.SensorModel(dropout_range=0.0, **kw)
    on = sim.SensorModel(dropout_range=0.9, **kw)
    # max_range 35 puts the far wall (r=30) deep into the (r/R)² dropout
    # regime (~66% dropped) while the near wall (r=10) loses ~7%
    x_off, _ = sim.render_scan(world, np.zeros(6), rng, sensor=off,
                               n_points=200_000, max_range=35.0)
    x_on, _ = sim.render_scan(world, np.zeros(6), rng, sensor=on,
                              n_points=200_000, max_range=35.0)
    far_off = int((x_off[:, 1] > 20).sum())
    far_on = int((x_on[:, 1] > 20).sum())
    near_off = int((x_off[:, 1] < 20).sum())
    near_on = int((x_on[:, 1] < 20).sum())
    assert far_off > 500
    assert far_on < 0.5 * far_off, (far_on, far_off)
    assert near_on > 0.8 * near_off, (near_on, near_off)


def test_dynamic_objects_move_and_stay_in_corridor():
    path = sim.loop_trajectory(n_scans=200, radius=20.0, speed=1.0)[:, :3]
    dyn = sim.DynamicObjects(path, seed=1, n_objects=6)
    p0, i0 = dyn.points_at(0.0)
    p1, _ = dyn.points_at(5.0)
    assert len(p0) > 0 and len(p0) == len(p1)
    # objects moved
    assert np.linalg.norm(p1 - p0, axis=1).max() > 1.0
    # and remain near the corridor (path ± lane + box extent)
    d = np.min(np.linalg.norm(p0[:, None, :2] - path[None, :, :2], axis=-1),
               axis=1)
    assert d.max() < 12.0


def test_slam_survives_realism_end_to_end(rng):
    """Odometry + loops stay sane with full realism on (the CPU-scale
    version of the phase3 realism rerun recorded on TPU in BENCH_r05)."""
    from xchu_slam_tpu.config import default_config
    from xchu_slam_tpu.models.device_pipeline import DeviceSlamPipeline
    from xchu_slam_tpu.types import make_cloud
    from xchu_slam_tpu.utils import se3
    import jax.numpy as jnp

    cfg = default_config().override({
        "filter.max_raw_points": 16384,
        "filter.max_points": 8192,
        "filter.outlier_method": "none",
        "ndt.grid_x": 72, "ndt.grid_y": 72, "ndt.grid_z": 16,
        "pgo.max_keyframes": 256, "pgo.max_loops": 32,
        "loop.submap_half_width": 6, "loop.submap_points": 8192,
        "loop.icp_fitness_thresh": 1.0,
        "sc.dist_thresh": 0.35,
    })
    world = sim.make_world(21, extent=60.0, ground_pts=150_000,
                           wall_pts_per_face=8000)
    gt = sim.loop_trajectory(n_scans=80, radius=16.0, speed=1.0)
    dyn = sim.DynamicObjects(gt[:, :3], seed=2, n_objects=5)
    sm = sim.SensorModel()
    pipe = DeviceSlamPipeline(cfg, kf_points=4096, log_capacity=128)
    for i, p in enumerate(gt):
        xyz, inten = sim.render_scan(world, p, rng, n_points=12_000,
                                     max_range=50.0, sensor=sm, dynamics=dyn,
                                     t=0.1 * i)
        assert len(xyz) > 2000, f"scan {i} starved: {len(xyz)} pts"
        pipe.process_scan(make_cloud(xyz, inten,
                                     capacity=cfg.filter.max_raw_points),
                          stamp=1.0 * i)
    pipe.finalize()
    gtT = np.asarray(se3.pose_to_matrix(jnp.asarray(gt)))
    gt_rel = np.einsum("ab,nbc->nac", np.linalg.inv(gtT[0]), gtT)
    st, _, opt = pipe.keyframe_trajectory()
    gi = np.round(st).astype(int)
    err = np.linalg.norm(opt[:, :3] - gt_rel[gi, :3, 3], axis=1)
    ate = float(np.sqrt(np.mean(err ** 2)))
    assert ate < 1.0, f"realism ATE {ate:.2f} m"
