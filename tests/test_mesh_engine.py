"""Mesh-mode SLAM engine: the full device step running as ONE SPMD program
over a `jax.sharding.Mesh` (replicated state, sharded compute) must reproduce
the single-device engine — including the loop-verify/apply branch whose ICP
and pose-graph collectives execute inside nested `lax.cond`s.

This is the runnable multi-chip path (`DeviceSlamPipeline(mesh=…)`), the same
code `__graft_entry__.dryrun_multichip` compiles — not an op-level demo.
Reference concurrency being covered: OMP point-parallel NDT reduction
(`ndt_omp_impl.hpp:187-280`), pgo worker threads (`pgo_node.cpp:12-14`),
descriptor DB search and iSAM2 backend (SURVEY.md §2d P1/P4/P5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xchu_slam_tpu.config import default_config
from xchu_slam_tpu.models import device_pipeline as dp
from xchu_slam_tpu.models import pose_graph as pg
from xchu_slam_tpu.ops import isc as isc_ops, scancontext as sc
from xchu_slam_tpu.types import make_cloud
from xchu_slam_tpu.utils import sim

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

AXIS = "data"


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), (AXIS,))


def _cfg(**over):
    base = {
        "filter.max_raw_points": 4096,
        "filter.max_points": 2048,
        "filter.outlier_method": "none",
        "ndt.grid_x": 48, "ndt.grid_y": 48, "ndt.grid_z": 16,
        "pgo.max_keyframes": 64, "pgo.max_loops": 8,
        "pgo.odom_noise_trans": 1e-3, "pgo.odom_noise_rot": 1e-3,
        "loop.icp_fitness_thresh": 1.5,
        "loop.submap_half_width": 4,
        "loop.submap_points": 2048,
    }
    base.update(over)
    return default_config().override(base)


@pytest.fixture(scope="module")
def sim_scans():
    world = sim.make_world(3, extent=60.0, ground_pts=30000)
    gt = sim.loop_trajectory(n_scans=60, radius=12.0, speed=1.0)
    rng = np.random.default_rng(5)
    return [sim.render_scan(world, p, rng, n_points=3000) for p in gt]


def test_mesh_engine_matches_single(sim_scans):
    """Full engine over the 8-device mesh (chunked ingest) vs the
    single-device engine (per-scan ingest; the two ingest modes are
    bit-identical single-device, tested in test_device_pipeline). SPMD
    partial-sum order gives tiny float divergence, so tolerances — not
    bit-equality — are the contract."""
    from xchu_slam_tpu.io.prefetch import DeviceChunkPrefetcher

    cfg = _cfg()
    single = dp.DeviceSlamPipeline(cfg, kf_points=1024, log_capacity=128)
    for i, (xyz, inten) in enumerate(sim_scans):
        cl = make_cloud(xyz, inten, capacity=cfg.filter.max_raw_points)
        single.process_scan(cl, stamp=0.1 * i)
    single.finalize()

    meshp = dp.DeviceSlamPipeline(cfg, kf_points=1024, log_capacity=128,
                                  mesh=_mesh())
    pf = DeviceChunkPrefetcher(sim_scans, capacity=cfg.filter.max_raw_points,
                               chunk=8, depth=2, threads=2)
    base = 0
    for clouds, n_real in pf:
        stamps = 0.1 * (base + np.arange(clouds.xyz.shape[0]))
        meshp.process_chunk(clouds, stamps, n_real)
        base += n_real
    meshp.finalize()

    assert meshp.scan_count == single.scan_count == len(sim_scans)
    assert abs(meshp.kf_count - single.kf_count) <= 1
    so = single.odometry_trajectory()
    mo = meshp.odometry_trajectory()
    d = np.linalg.norm(so[:, :3] - mo[:, :3], axis=1)
    assert d.max() < 0.10, f"mesh odometry diverged: max {d.max():.3f} m"
    # a borderline keyframe-gate flip shifts every subsequent keyframe's
    # STAMP by a scan, so index/stamp-matched keyframe comparison is not
    # meaningful; instead check each mesh keyframe's optimized world pose
    # against the single-device run's per-scan odometry at the same stamp
    # (no loops fire on this 60-scan arc, so opt == chained odometry)
    ms, _, mopt = meshp.keyframe_trajectory()
    scan_idx = np.rint(np.asarray(ms) / 0.1).astype(int)
    dk = np.linalg.norm(mopt[:, :3] - so[scan_idx, :3], axis=1)
    assert dk.max() < 0.15


@pytest.fixture(scope="module")
def sim_scans_revisit():
    """100-scan closed loop: the tail revisits the head, so descriptor
    retrieval + ICP verify + graph solve all fire."""
    world = sim.make_world(3, extent=60.0, ground_pts=30000)
    gt = sim.loop_trajectory(n_scans=100, radius=12.0, speed=1.0)
    rng = np.random.default_rng(5)
    return [sim.render_scan(world, p, rng, n_points=3000) for p in gt]


def test_mesh_engine_isc_loop_matches_single(sim_scans_revisit):
    """ISC mode as ONE SPMD program (sharded ISC DB scoring inside the
    keyframe cond, sharded ICP + factor solve in the accept branch) vs the
    single-device engine, including ACCEPTED loops — the ISC analogue of
    test_mesh_engine_matches_single. Reference: loop_method=2
    (pgo_node.cpp:61-64), ISC retrieval (ISCGeneration.cpp:157-193)."""
    from xchu_slam_tpu.io.prefetch import DeviceChunkPrefetcher

    cfg = _cfg(**{"loop.method": "isc", "loop.icp_fitness_thresh": 3.0})
    single = dp.DeviceSlamPipeline(cfg, kf_points=1024, log_capacity=128)
    for i, (xyz, inten) in enumerate(sim_scans_revisit):
        cl = make_cloud(xyz, inten, capacity=cfg.filter.max_raw_points)
        single.process_scan(cl, stamp=0.1 * i)
    single.finalize()
    assert single.loop_count > 0          # the ISC loop chain actually fired

    meshp = dp.DeviceSlamPipeline(cfg, kf_points=1024, log_capacity=128,
                                  mesh=_mesh())
    pf = DeviceChunkPrefetcher(sim_scans_revisit,
                               capacity=cfg.filter.max_raw_points,
                               chunk=8, depth=2, threads=2)
    base = 0
    for clouds, n_real in pf:
        stamps = 0.1 * (base + np.arange(clouds.xyz.shape[0]))
        meshp.process_chunk(clouds, stamps, n_real)
        base += n_real
    meshp.finalize()

    assert meshp.loop_count > 0
    # borderline gate flips can shift a keyframe by one scan between the two
    # runs; counts must agree to ±1 and every mesh loop must close the same
    # revisit region
    assert abs(meshp.loop_count - single.loop_count) <= 1
    assert all(r.method == "isc" for r in meshp.loops)
    so = single.odometry_trajectory()
    mo = meshp.odometry_trajectory()
    d = np.linalg.norm(so[:, :3] - mo[:, :3], axis=1)
    assert d.max() < 0.15, f"mesh odometry diverged: max {d.max():.3f} m"


def _planted_state(spec, cfg, rng):
    """Copy of test_device_pipeline's planted revisit state (keyframes 10/11
    share a structured cloud 2 m apart → ICP must accept the loop)."""
    from xchu_slam_tpu.models.pipeline import empty_db

    n = 2048
    g = np.c_[rng.uniform(-10, 10, (n // 2, 2)), rng.normal(0, 0.02, n // 2)]
    w1 = np.c_[rng.uniform(-10, 10, n // 4), np.full(n // 4, 6.0),
               rng.uniform(0, 3, n // 4)]
    w2 = np.c_[np.full(n - n // 2 - n // 4, -8.0),
               rng.uniform(-10, 10, n - n // 2 - n // 4),
               rng.uniform(0, 3, n - n // 2 - n // 4)]
    cloud = np.vstack([g, w1, w2]).astype(np.float32)

    db = empty_db(cfg, 2048)
    K = 12
    poses = np.zeros((K, 6), np.float32)
    poses[:, 0] = np.arange(K) * 2.0
    for k in range(K):
        db = db._replace(
            poses=db.poses.at[k].set(jnp.asarray(poses[k])),
            opt_poses=db.opt_poses.at[k].set(jnp.asarray(poses[k])),
            stamps=db.stamps.at[k].set(0.5 * k),
            travel=db.travel.at[k].set(2.0 * k),
            clouds=db.clouds.at[k].set(jnp.asarray(cloud)),
            cloud_mask=db.cloud_mask.at[k].set(jnp.ones(2048, bool)),
            count=jnp.int32(k + 1),
        )
    graph = pg.empty_graph(spec.gspec)
    Z = np.eye(4, dtype=np.float32)
    Z[0, 3] = 2.0
    graph = graph._replace(
        between_T=jnp.asarray(np.tile(Z, (spec.gspec.max_keyframes, 1, 1))),
        kf_mask=graph.kf_mask.at[:K].set(True),
    )
    return dp.DevState(
        odom=None,
        db=db, graph=graph,
        kf_accum=jnp.float32(0.0), travel=jnp.float32(2.0 * K),
        last_kf_odom=jnp.asarray(poses[-1]),
        loop_count=jnp.int32(0), scan_count=jnp.int32(K),
        imu_vel=jnp.zeros(3, jnp.float32),
        last_stamp=jnp.float32(0.0),
        log=jnp.zeros((spec.log_capacity, 16), jnp.float32),
        diag=jnp.asarray(dp._DIAG_RESET),
    )


def test_mesh_verify_and_apply_accepts_true_loop():
    """The riskiest SPMD path at runtime: sharded ICP (all-gather-summed
    Procrustes moments) and the factor-sharded pose-graph solve, executing
    inside the accept branch's nested conds — on an 8-device mesh, against
    the single-device result."""
    cfg = _cfg(**{"loop.max_correction": 5.0})
    rng = np.random.default_rng(0)

    spec1 = dp.spec_from_config(cfg, kf_points=2048, log_capacity=64)
    state1 = _planted_state(spec1, cfg, rng)
    ref = dp._verify_and_apply(state1, jnp.int32(11), jnp.int32(10),
                               jnp.float32(0.0), spec1)
    assert int(ref.loop_count) == 1

    mesh = _mesh()
    specm = dp.spec_from_config(cfg, kf_points=2048, log_capacity=64,
                                axis=AXIS)
    rng = np.random.default_rng(0)
    statem = _planted_state(specm, cfg, rng)
    statem = jax.device_put(statem, NamedSharding(mesh, P()))

    def body(state):
        return dp._verify_and_apply(state, jnp.int32(11), jnp.int32(10),
                                    jnp.float32(0.0), specm)

    f = jax.jit(shard_map(body, mesh=mesh, in_specs=(P(),), out_specs=P(),
                          check_vma=False))
    out = f(statem)
    assert int(out.loop_count) == 1
    assert int(out.graph.loop_i[0]) == 10 and int(out.graph.loop_j[0]) == 11
    np.testing.assert_allclose(np.asarray(out.graph.loop_T[0]),
                               np.asarray(ref.graph.loop_T[0]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.db.opt_poses[:12]),
                               np.asarray(ref.db.opt_poses[:12]), atol=5e-3)


def test_pg_solve_factor_sharded_matches_single():
    """pg.solve(axis=…) — the engine's in-step solver — against the
    single-device solve on a drifted chain with a strong loop factor."""
    spec = pg.GraphSpec(max_keyframes=64, max_loops=8,
                        odom_info_t=100.0, odom_info_r=100.0,
                        gn_iterations=4, cg_iterations=40)
    K = 64
    graph = pg.empty_graph(spec)
    poses = np.zeros((K, 6), np.float32)
    poses[:, 0] = np.arange(K) * 1.03            # 3 % scale drift
    poses[:, 5] = np.arange(K) * 0.002
    between = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    between[:, 0, 3] = 1.0
    li = np.zeros(8, np.int32)
    lj = np.zeros(8, np.int32)
    lT = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    lT[0, 0, 3] = float(K - 1)
    linfo = np.zeros(8, np.float32)
    lmask = np.zeros(8, bool)
    lj[0], linfo[0], lmask[0] = K - 1, 10.0, True
    graph = graph._replace(
        between_T=jnp.asarray(between), kf_mask=jnp.ones(K, bool),
        loop_i=jnp.asarray(li), loop_j=jnp.asarray(lj),
        loop_T=jnp.asarray(lT), loop_info=jnp.asarray(linfo),
        loop_mask=jnp.asarray(lmask))

    ref = np.asarray(pg.solve(jnp.asarray(poses), graph, spec))

    mesh = _mesh()
    f = jax.jit(shard_map(
        lambda p, g: pg.solve(p, g, spec, axis=AXIS),
        mesh=mesh, in_specs=(P(), P()), out_specs=P(), check_vma=False),
        static_argnums=())
    out = np.asarray(f(jnp.asarray(poses), graph))
    np.testing.assert_allclose(out, ref, atol=2e-4)
    # the loop actually corrected the drift
    assert abs(out[K - 1, 0] - (K - 1)) < 0.5


def test_sc_detect_sharded_matches_single():
    rng = np.random.default_rng(3)
    spec = sc.ScSpec(num_exclude_recent=4, dist_thresh=0.5)
    K = 64
    db = jnp.asarray(rng.uniform(0, 2, (K, spec.num_ring, spec.num_sector))
                     .astype(np.float32))
    query = jnp.asarray(np.roll(np.asarray(db[7]), 5, axis=1))
    ref = sc.detect_loop(query, db, jnp.int32(40), spec)

    mesh = _mesh()
    f = jax.jit(shard_map(
        lambda q, d, c: sc.detect_loop(q, d, c, spec, axis=AXIS),
        mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(), check_vma=False))
    out = f(query, db, jnp.int32(40))
    assert int(out.idx) == int(ref.idx) == 7
    np.testing.assert_allclose(float(out.dist), float(ref.dist), atol=1e-6)
    np.testing.assert_allclose(float(out.yaw), float(ref.yaw), atol=1e-6)


def test_isc_detect_sharded_matches_single():
    rng = np.random.default_rng(4)
    spec = isc_ops.IscSpec(num_ring=20, num_sector=24,
                           skip_neighbor_distance=5.0,
                           inflation_covariance=0.5,
                           geometry_thresh=0.2, intensity_thresh=0.2)
    K = 32
    db = jnp.asarray(rng.uniform(0, 1, (K, 20, 24)).astype(np.float32))
    query = db[3]
    positions = jnp.asarray(np.c_[np.arange(K), np.zeros((K, 2))]
                            .astype(np.float32))
    travel = jnp.asarray(np.arange(K, dtype=np.float32) * 2.0)
    ref = isc_ops.detect_loop(query, db, jnp.int32(K), positions, travel, spec)

    mesh = _mesh()
    f = jax.jit(shard_map(
        lambda q, d, c, p, t: isc_ops.detect_loop(q, d, c, p, t, spec,
                                                  axis=AXIS),
        mesh=mesh, in_specs=(P(),) * 5, out_specs=P(), check_vma=False))
    out = f(query, db, jnp.int32(K), positions, travel)
    assert int(out.idx) == int(ref.idx)
    assert bool(out.found) == bool(ref.found)
    np.testing.assert_allclose(float(out.score), float(ref.score), atol=1e-5)
