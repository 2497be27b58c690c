"""End-to-end pipeline test on a closed synthetic circuit with loop closures."""

import numpy as np
import pytest

from xchu_slam_tpu.config import (FilterConfig, LoopConfig, NdtConfig, PgoConfig,
                                  SlamConfig)
from xchu_slam_tpu.models.pipeline import SlamPipeline
from xchu_slam_tpu.utils import metrics, sim


def small_cfg():
    return SlamConfig(
        filter=FilterConfig(max_raw_points=16384, max_points=8192,
                            outlier_method="none"),
        ndt=NdtConfig(grid_x=72, grid_y=72, grid_z=16, max_iterations=30),
        # NOTE: ICP fitness is mean-sq NN distance — its scale tracks cloud
        # density. The synthetic world is ~10× sparser than real KITTI scans,
        # so the acceptance gate is scaled up accordingly (default stays 0.3).
        loop=LoopConfig(method="sc", detect_period=2, submap_half_width=10,
                        submap_points=16384, icp_fitness_thresh=0.5),
        pgo=PgoConfig(max_keyframes=256, max_loops=32,
                      odom_noise_trans=1e-3, odom_noise_rot=1e-3,
                      gn_iterations=6, cg_iterations=80),
    )


@pytest.fixture(scope="module")
def pipeline_run():
    cfg = small_cfg()
    pipe = SlamPipeline(cfg, kf_points=4096)
    world = sim.make_world(21, extent=70.0, ground_pts=80_000)
    # perimeter ≈ 7·radius; wrap past start to create genuine revisits
    radius = 25.0
    n_scans = int(7.02 * radius) + 40
    gt = sim.loop_trajectory(n_scans=n_scans, radius=radius, speed=1.0)
    rng = np.random.default_rng(21)
    for i, p in enumerate(gt):
        xyz, inten = sim.render_scan(world, p, rng, n_points=12_000, max_range=50.0)
        pipe.process_scan(xyz, inten, stamp=0.1 * i)
    pipe.finalize()
    return pipe, gt


def test_pipeline_produces_keyframes(pipeline_run):
    pipe, gt = pipeline_run
    n = int(pipe.db.count)
    # ~2 m gating on a ~215 m course → ~100 keyframes
    assert 70 < n < 140, n


def test_pipeline_finds_loops(pipeline_run):
    pipe, gt = pipeline_run
    assert pipe.loop_count >= 1, "closed circuit must produce verified loops"
    for rec in pipe.loops:
        assert rec.fitness <= pipe.cfg.loop.icp_fitness_thresh
        # loop endpoints must be genuinely distant in time
        assert rec.j - rec.i > 10


def test_pipeline_loop_transforms_accurate(pipeline_run):
    """Accepted loop measurements must match ground truth to decimetres."""
    import jax.numpy as jnp
    from xchu_slam_tpu.utils import se3
    pipe, gt = pipeline_run
    stamps, kf_odo, kf_opt = pipe.keyframe_trajectory()
    idx = np.round(stamps / 0.1).astype(int)
    gtT = np.asarray(se3.pose_to_matrix(jnp.asarray(gt)))
    for q, rec in enumerate(pipe.loops):
        Z = np.asarray(pipe.graph.loop_T[q])
        true_rel = np.linalg.inv(gtT[idx[rec.i]]) @ gtT[idx[rec.j]]
        err = np.linalg.norm(Z[:3, 3] - true_rel[:3, 3])
        # transform error tracks ICP fitness on sparse synthetic clouds; the
        # robust (Cauchy, 1/fitness-weighted) PGO absorbs the marginal ones
        assert err < 0.25 + 1.0 * rec.fitness, (q, rec, err)


def test_pipeline_trajectory_accuracy(pipeline_run):
    import jax.numpy as jnp
    from xchu_slam_tpu.utils import se3
    pipe, gt = pipeline_run
    # the pipeline starts at the origin; express gt in the first-pose frame
    gtT = np.asarray(se3.pose_to_matrix(jnp.asarray(gt)))
    gt_rel = np.einsum("ab,nbc->nac", np.linalg.inv(gtT[0]), gtT)
    gt_xyz = gt_rel[:, :3, 3]
    # odometry trajectory: all scans after the first
    odo = pipe.odometry_trajectory()
    ate_odo = metrics.ape_rmse(odo[:, :3], gt_xyz[1:len(odo) + 1], align=False)
    stamps, kf_odo, kf_opt = pipe.keyframe_trajectory()
    # match keyframes to gt by stamp (scan index = stamp/0.1)
    idx = np.round(stamps / 0.1).astype(int)
    gt_kf = gt_xyz[idx]
    ate_opt = metrics.ape_rmse(kf_opt[:, :3], gt_kf, align=False)
    # the full system must stay well within the reference's KITTI bound scaled
    # to this course, and loop closure must not make things worse
    assert ate_opt < 1.0, (ate_odo, ate_opt)
    assert ate_opt <= ate_odo * 1.2 + 0.05


def test_pipeline_map_assembly(pipeline_run):
    pipe, gt = pipeline_run
    m = pipe.assemble_map(voxel=0.5)
    assert len(m) > 10_000
    assert np.isfinite(m).all()
