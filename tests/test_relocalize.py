"""Multi-session place recognition end-to-end (models/relocalize.py):
map a session, checkpoint it, then localize a SECOND session's scans
(independent sensor noise) against the saved database.

Beyond reference parity: the reference ships multi-session SC matching only
as an uncalled library capability (Scancontext.cpp:267-328)."""

import numpy as np
import pytest

from xchu_slam_tpu.config import default_config
from xchu_slam_tpu.models.device_pipeline import DeviceSlamPipeline
from xchu_slam_tpu.models.relocalize import (SessionLocalizer,
                                             localizer_from_checkpoint)
from xchu_slam_tpu.types import make_cloud
from xchu_slam_tpu.utils import se3, sim


def _cfg():
    return default_config().override({
        "filter.max_raw_points": 16384,
        "filter.max_points": 8192,
        "filter.outlier_method": "none",
        "ndt.grid_x": 72, "ndt.grid_y": 72, "ndt.grid_z": 16,
        "pgo.max_keyframes": 256, "pgo.max_loops": 32,
        "pgo.odom_noise_trans": 1e-3, "pgo.odom_noise_rot": 1e-3,
        "loop.submap_half_width": 6, "loop.submap_points": 8192,
        # sim clouds are sparser than real KITTI returns (see cli.cmd_run_sim)
        "loop.icp_fitness_thresh": 1.0,
        "sc.dist_thresh": 0.35,
    })


@pytest.fixture(scope="module")
def mapped_session(tmp_path_factory):
    from xchu_slam_tpu.utils.checkpoint import save_checkpoint

    cfg = _cfg()
    world = sim.make_world(21, extent=70.0, ground_pts=80_000)
    gt = sim.loop_trajectory(n_scans=120, radius=25.0, speed=1.0)
    rng = np.random.default_rng(21)
    pipe = DeviceSlamPipeline(cfg, kf_points=4096, log_capacity=256)
    for i, p in enumerate(gt):
        xyz, inten = sim.render_scan(world, p, rng, n_points=12_000,
                                     max_range=50.0)
        cl = make_cloud(xyz, inten, capacity=cfg.filter.max_raw_points)
        pipe.process_scan(cl, stamp=1.0 * i)
    pipe.finalize()
    path = str(tmp_path_factory.mktemp("sess") / "checkpoint.npz")
    save_checkpoint(pipe, path)
    import jax.numpy as jnp
    gtT = np.asarray(se3.pose_to_matrix(jnp.asarray(gt)))
    gt_rel = np.einsum("ab,nbc->nac", np.linalg.inv(gtT[0]), gtT)
    return cfg, world, gt, gt_rel, pipe, path


def test_second_session_localizes(mapped_session):
    cfg, world, gt, gt_rel, pipe, _ = mapped_session
    assert pipe.kf_count > 20
    loc = SessionLocalizer(pipe.db, cfg)
    rng = np.random.default_rng(99)           # independent query noise
    hits, errs = 0, []
    for i in (15, 40, 65, 90, 110):
        xyz, inten = sim.render_scan(world, gt[i], rng, n_points=12_000,
                                     max_range=50.0)
        r = loc.localize(xyz, inten)
        if r.found:
            hits += 1
            errs.append(np.linalg.norm(r.pose[:3] - gt_rel[i, :3, 3]))
    assert hits >= 4, f"only {hits}/5 queries localized"
    assert np.median(errs) < 1.0, f"median err {np.median(errs):.2f} m"


def test_off_map_query_rejected(mapped_session):
    cfg, world, gt, _gt_rel, pipe, _ = mapped_session
    loc = SessionLocalizer(pipe.db, cfg)
    rng = np.random.default_rng(7)
    # a pose far outside the mapped world: the scan sees (almost) nothing the
    # session saw -> retrieval or verification must reject it
    far = np.array([400.0, 400.0, 0.0, 0.0, 0.0, 0.3], np.float32)
    xyz, inten = sim.render_scan(world, far, rng, n_points=12_000,
                                 max_range=50.0)
    r = loc.localize(xyz, inten)
    assert not r.found


def test_session_continuation_merges_maps(mapped_session):
    """Map reuse, not just relocalization (VERDICT r3 stretch): continue a
    saved session — relocalize session B's first scan into session A's map,
    append B's keyframes/factors to A's graph, and verify B's later
    revisits loop-close against A's keyframes. The merged map's ATE on B's
    keyframes must beat mapping B alone (whose only correction is its own
    lap closure)."""
    from xchu_slam_tpu.models.continue_session import continue_session

    cfg, world, gt, gt_rel, pipe, path = mapped_session
    rng = np.random.default_rng(55)
    # sparser scans than session A -> session B's odometry drifts more,
    # which is exactly what the cross-session loops must correct
    scans = [sim.render_scan(world, p, rng, n_points=5000, max_range=50.0)
             for p in gt]

    cont = continue_session(path, scans[0][0], scans[0][1], stamp=1000.0)
    K0 = cont.continuation["old_keyframes"]
    assert K0 > 20
    assert np.linalg.norm(cont.continuation["reloc_pose"][:2]
                          - gt_rel[0, :2, 3]) < 2.0
    for i in range(1, len(scans)):
        cl = make_cloud(*scans[i], capacity=cfg.filter.max_raw_points)
        cont.process_scan(cl, stamp=1000.0 + i)
    cont.finalize()
    assert cont.kf_count > K0 + 20          # B's keyframes appended

    # at least one loop closing B (j >= K0) against A's map (i < K0);
    # the continuation seed itself contributes one — require another from
    # the in-session detection chain as well
    li = np.asarray(cont.graph.loop_i[:cont.loop_count])
    lj = np.asarray(cont.graph.loop_j[:cont.loop_count])
    cross = [(int(a), int(b)) for a, b in zip(li, lj) if b >= K0 and a < K0]
    assert len(cross) >= 2, f"cross-session loops: {cross}"

    def _new_kf_ate(p, k_from, stamp0):
        st, _, opt = p.keyframe_trajectory()
        sel = np.arange(p.kf_count) >= k_from
        gi = np.round(st[sel] - stamp0).astype(int)
        ok = (gi >= 0) & (gi < len(gt))
        return float(np.sqrt(np.mean(np.sum(
            (opt[sel][ok][:, :3] - gt_rel[gi[ok], :3, 3]) ** 2, axis=1))))

    ate_merged = _new_kf_ate(cont, K0, 1000.0)

    alone = DeviceSlamPipeline(cfg, kf_points=4096, log_capacity=256)
    for i, (xyz, inten) in enumerate(scans):
        cl = make_cloud(xyz, inten, capacity=cfg.filter.max_raw_points)
        alone.process_scan(cl, stamp=1.0 * i)
    alone.finalize()
    ate_alone = _new_kf_ate(alone, 0, 0.0)
    assert ate_merged < ate_alone, (ate_merged, ate_alone)
    assert ate_merged < 1.0, ate_merged


def test_checkpoint_roundtrip_localizer(mapped_session):
    cfg, world, gt, gt_rel, pipe, path = mapped_session
    loc = localizer_from_checkpoint(path)
    rng = np.random.default_rng(123)
    xyz, inten = sim.render_scan(world, gt[40], rng, n_points=12_000,
                                 max_range=50.0)
    r = loc.localize(xyz, inten)
    assert r.found
    assert np.linalg.norm(r.pose[:3] - gt_rel[40, :3, 3]) < 1.5


def test_session_continuation_on_mesh(mapped_session):
    """Mesh-mode continuation (VERDICT r4 item 8): the host-side continuation
    seed replicates onto a 4-device mesh and the continued run executes as
    the SPMD engine, matching the single-device continuation closely."""
    import jax
    from jax.sharding import Mesh
    from xchu_slam_tpu.models.continue_session import continue_session

    cfg, world, gt, gt_rel, pipe, path = mapped_session
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    rng = np.random.default_rng(77)
    scans = [sim.render_scan(world, gt[i], rng, n_points=5000, max_range=50.0)
             for i in range(30)]

    def _continue(mesh):
        cont = continue_session(path, scans[0][0], scans[0][1], stamp=1000.0,
                                mesh=mesh)
        for i in range(1, len(scans)):
            cl = make_cloud(*scans[i], capacity=cfg.filter.max_raw_points)
            cont.process_scan(cl, stamp=1000.0 + i)
        cont.finalize()
        return cont

    cont4 = _continue(mesh)
    K0 = cont4.continuation["old_keyframes"]
    assert cont4.kf_count > K0 + 5          # new keyframes appended on mesh

    cont1 = _continue(None)
    assert cont4.kf_count == cont1.kf_count
    _, _, opt4 = cont4.keyframe_trajectory()
    _, _, opt1 = cont1.keyframe_trajectory()
    # sharded reductions reorder float sums vs the single-device path, so
    # bit-equality is not expected — trajectories must agree to mm level
    np.testing.assert_allclose(opt4, opt1, atol=5e-3)
