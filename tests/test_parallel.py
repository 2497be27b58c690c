"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xchu_slam_tpu.models import pose_graph as pg
from xchu_slam_tpu.ops import ndt, scancontext as sc, voxel_map as vm
from xchu_slam_tpu.parallel import sharded
from xchu_slam_tpu.utils import sim


needs_devices = pytest.mark.skipif(len(jax.devices()) < 8,
                                   reason="needs 8 virtual devices")

GSPEC = vm.GridSpec(gx=48, gy=48, gz=16, resolution=2.0, min_points=6,
                    eig_inflation=0.01)
NSPEC = ndt.NdtSpec(max_iterations=25)


@needs_devices
def test_sharded_ndt_matches_single_device(rng):
    from tests.test_ndt import make_world, build_grid
    world = make_world(rng)
    grid = build_grid(world)
    n = 2048
    src = jnp.asarray(world[rng.choice(len(world), n, replace=False)])
    mask = jnp.ones(n, bool)
    init = jnp.array([0.3, -0.2, 0.0, 0.0, 0.0, 0.02], jnp.float32)

    ref = ndt.align(grid, src, mask, init, GSPEC, NSPEC)
    mesh = sharded.make_mesh(8)
    pose, iters, conv = sharded.sharded_ndt_align(
        mesh, grid, src, mask, init, GSPEC, NSPEC)
    # different reduction orders → different FP paths; both must recover the
    # true pose (identity) to the usual per-axis tolerances
    for p_ in (np.asarray(pose), np.asarray(ref.pose)):
        np.testing.assert_allclose(p_[[0, 1]], 0.0, atol=0.05)
        np.testing.assert_allclose(p_[2], 0.0, atol=0.12)
        np.testing.assert_allclose(p_[3:], 0.0, atol=0.02)


@needs_devices
def test_sharded_sc_matches_single_device(rng):
    spec = sc.ScSpec()
    world = sim.make_world(2, extent=90.0)
    g = np.random.default_rng(1)
    K = 64
    db = np.zeros((K, spec.num_ring, spec.num_sector), np.float32)
    for i in range(40):
        p = np.array([25 * np.cos(i), 25 * np.sin(1.7 * i), 0, 0, 0, 0.3 * i],
                     np.float32)
        xyz, _ = sim.render_scan(world, p, g, n_points=6000)
        db[i] = np.asarray(sc.make_descriptor(
            jnp.asarray(xyz), jnp.ones(len(xyz), bool), spec))
    p5 = np.array([25 * np.cos(5), 25 * np.sin(8.5), 0, 0, 0, 1.5 + np.pi / 2],
                  np.float32)
    xyz, _ = sim.render_scan(world, p5, g, n_points=6000)
    q = sc.make_descriptor(jnp.asarray(xyz), jnp.ones(len(xyz), bool), spec)

    ref = sc.detect_loop(q, jnp.asarray(db), jnp.int32(40), spec)
    mesh = sharded.make_mesh(8)
    got = sharded.sharded_sc_detect(mesh, q, jnp.asarray(db), 40, spec)
    assert bool(got.found) == bool(ref.found)
    assert int(got.idx) == int(ref.idx)
    np.testing.assert_allclose(float(got.dist), float(ref.dist), atol=1e-5)


@needs_devices
def test_sharded_pgo_grad_matches(rng):
    from tests.test_pose_graph import chain_graph, SPEC
    gt, poses, g, n = chain_graph(rng, 40)
    mesh = sharded.make_mesh(8)
    got = sharded.sharded_pgo_hvp_demo(mesh, jnp.asarray(poses), g, SPEC)

    # single-device oracle of the same objective
    from xchu_slam_tpu.utils import se3
    T = se3.pose_to_matrix(jnp.asarray(poses))

    def obj(xi):
        K = poses.shape[0]
        mask0 = jnp.ones((K, 1), xi.dtype).at[0, 0].set(0.0)
        Tn = jnp.matmul(T, se3.se3_exp(xi * mask0))
        r = jax.vmap(pg._between_residual)(Tn[:-1], Tn[1:], g.between_T[1:])
        w = jnp.where((g.kf_mask[:-1] & g.kf_mask[1:])[:, None],
                      jnp.array([SPEC.odom_info_t] * 3 + [SPEC.odom_info_r] * 3),
                      0.0)
        return 0.5 * jnp.sum(w * r * r)

    ref = jax.grad(obj)(jnp.zeros((poses.shape[0], 6), jnp.float32))
    # info weights of 1e6 amplify f32 reduction-order noise into ~0.1-scale
    # absolute differences on ~1e4-scale intermediates; that is expected
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=0.5)


@needs_devices
def test_sharded_pgo_solve_matches_single(rng):
    """Factor-sharded full solve ≈ single-device solve on a loopy chain."""
    from tests.test_pose_graph import chain_graph, SPEC, SOFT
    from xchu_slam_tpu.utils import se3 as se3u

    gt, poses, g, n = chain_graph(rng, 60, drift_t=0.05)
    gtT = np.asarray(se3u.pose_to_matrix(jnp.asarray(gt)))
    Z = np.linalg.inv(gtT[0]) @ gtT[n - 1]
    li = np.zeros(SPEC.max_loops, np.int32)
    lj = np.zeros(SPEC.max_loops, np.int32)
    lT = np.tile(np.eye(4, dtype=np.float32), (SPEC.max_loops, 1, 1))
    linfo = np.zeros(SPEC.max_loops, np.float32)
    lm = np.zeros(SPEC.max_loops, bool)
    li[0], lj[0], lT[0], linfo[0], lm[0] = 0, n - 1, Z, 10.0, True
    g = g._replace(loop_i=jnp.asarray(li), loop_j=jnp.asarray(lj),
                   loop_T=jnp.asarray(lT), loop_info=jnp.asarray(linfo),
                   loop_mask=jnp.asarray(lm))

    ref = np.asarray(pg.solve(jnp.asarray(poses), g, SOFT))
    mesh = sharded.make_mesh(8)
    got = np.asarray(sharded.sharded_pgo_solve(mesh, jnp.asarray(poses), g, SOFT))
    np.testing.assert_allclose(got[:n, :3], ref[:n, :3], atol=0.05)
    # and it actually closes the loop (same check as the single-device test)
    drift_after = np.linalg.norm(got[n - 1, :3] - gt[n - 1, :3])
    drift_before = np.linalg.norm(poses[n - 1, :3] - gt[n - 1, :3])
    assert drift_after < 0.3 * drift_before


@needs_devices
def test_slam_superstep_matches_components(rng):
    """ONE-program multi-chip superstep (align + descriptor/retrieval + graph
    solve) must agree with the single-device component results."""
    from tests.test_ndt import build_grid, make_world

    world = make_world(rng)
    grid = build_grid(world)
    n = 2048
    src = jnp.asarray(world[rng.choice(len(world), n, replace=False)])
    mask = jnp.ones(n, bool)
    init = jnp.array([0.3, -0.2, 0.0, 0.0, 0.0, 0.02], jnp.float32)

    spec = sc.ScSpec(num_exclude_recent=4)
    K = 32
    db_np = rng.uniform(0, 2, (K, spec.num_ring, spec.num_sector)).astype(np.float32)
    # plant the query descriptor (rotated) at index 3 so retrieval must find it
    query_desc = sc.make_descriptor(src, mask, spec)
    db_np[3] = np.roll(np.asarray(query_desc), 7, axis=1)
    db = jnp.asarray(db_np)

    gsp = pg.GraphSpec(max_keyframes=K, max_loops=8,
                       odom_info_t=100.0, odom_info_r=100.0,
                       gn_iterations=3, cg_iterations=30)
    graph = pg.empty_graph(gsp)
    poses = np.zeros((K, 6), np.float32)
    poses[:, 0] = np.arange(K, dtype=np.float32) * 1.05
    between = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    between[:, 0, 3] = 1.0
    li = np.zeros(8, np.int32); lj = np.zeros(8, np.int32)
    lT = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    lT[0, 0, 3] = float(K - 1)
    linfo = np.zeros(8, np.float32); lmask = np.zeros(8, bool)
    li[0], lj[0], linfo[0], lmask[0] = 0, K - 1, 10.0, True
    graph = graph._replace(
        between_T=jnp.asarray(between), kf_mask=jnp.ones(K, bool),
        loop_i=jnp.asarray(li), loop_j=jnp.asarray(lj),
        loop_T=jnp.asarray(lT), loop_info=jnp.asarray(linfo),
        loop_mask=jnp.asarray(lmask))

    mesh = sharded.make_mesh(8)
    pose, iters, desc, cand, opt = sharded.slam_superstep(
        mesh, grid, src, mask, init, GSPEC, NSPEC, db, K, spec,
        jnp.asarray(poses), graph, gsp)

    # 1. alignment recovers the identity pose (same tolerances as the
    #    dedicated sharded-NDT test)
    p_ = np.asarray(pose)
    np.testing.assert_allclose(p_[[0, 1]], 0.0, atol=0.05)
    np.testing.assert_allclose(p_[3:], 0.0, atol=0.02)

    # 2. pmax-composed descriptor equals the single-device scatter-max
    np.testing.assert_allclose(np.asarray(desc), np.asarray(query_desc),
                               atol=1e-6)

    # 3. retrieval finds the planted match with the planted rotation
    dist, idx, shift = float(cand[0]), int(cand[1]), int(cand[2])
    assert idx == 3 and dist < spec.dist_thresh
    # db[3] = roll(query, +7): the matching shift s satisfies
    # roll(db[3], s) == query, i.e. s ≡ -7 (mod S)
    assert (-shift) % spec.num_sector == 7

    # 4. factor-sharded solve equals the single-device solve
    ref_opt = pg.solve(jnp.asarray(poses), graph, gsp)
    np.testing.assert_allclose(np.asarray(opt), np.asarray(ref_opt),
                               atol=5e-3)
