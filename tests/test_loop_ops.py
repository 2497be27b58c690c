import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.ops import icp, isc as isc_ops, scancontext as sc
from xchu_slam_tpu.utils import se3, sim

SCSPEC = sc.ScSpec()
ISPEC = isc_ops.IscSpec()


def scan_at(world, pose, rng, n=8000):
    xyz, inten = sim.render_scan(world, np.asarray(pose, np.float32), rng, n_points=n)
    return jnp.asarray(xyz), jnp.asarray(inten), jnp.ones(len(xyz), bool)


def test_sc_descriptor_rotation_shifts_columns(rng):
    world = sim.make_world(2, extent=90.0)
    p0 = np.zeros(6, np.float32)
    p_rot = np.array([0, 0, 0, 0, 0, 2 * np.pi * 6 / 60], np.float32)  # 6 sectors
    xyz0, _, m0 = scan_at(world, p0, np.random.default_rng(0))
    xyz1, _, m1 = scan_at(world, p_rot, np.random.default_rng(0))
    d0 = sc.make_descriptor(xyz0, m0, SCSPEC)
    d1 = sc.make_descriptor(xyz1, m1, SCSPEC)
    # rotating the sensor by k sectors circularly shifts the descriptor
    best_k, best_v = 0, 1e9
    for k in range(60):
        v = float(jnp.mean(jnp.abs(d0 - jnp.roll(d1, k, axis=1))))
        if v < best_v:
            best_k, best_v = k, v
    assert best_k in (6, 54), best_k


def test_sc_detect_loop_same_place(rng):
    world = sim.make_world(2, extent=90.0)
    K = 64
    R, S = SCSPEC.num_ring, SCSPEC.num_sector
    db = np.zeros((K, R, S), np.float32)
    g = np.random.default_rng(1)
    # fill DB with descriptors from distinct places
    for i in range(40):
        p = np.array([25.0 * np.cos(i), 25.0 * np.sin(i * 1.7), 0, 0, 0, i * 0.3],
                     np.float32)
        xyz, _, m = scan_at(world, p, g)
        db[i] = np.asarray(sc.make_descriptor(xyz, m, SCSPEC))
    # query = revisit of place stored at index 5, rotated by 90°
    p5 = np.array([25.0 * np.cos(5), 25.0 * np.sin(5 * 1.7), 0, 0, 0, 5 * 0.3],
                  np.float32)
    p5_rot = p5.copy()
    p5_rot[5] += np.pi / 2
    xyz, _, m = scan_at(world, p5_rot, g)
    q = sc.make_descriptor(xyz, m, SCSPEC)
    res = sc.detect_loop(q, jnp.asarray(db), jnp.int32(40), SCSPEC)
    assert bool(res.found)
    assert int(res.idx) == 5
    assert float(res.dist) < 0.2
    # yaw estimate ≈ ±π/2 (convention fixed here)
    assert abs(abs(float(res.yaw)) - np.pi / 2) < 0.2


def test_sc_excludes_recent(rng):
    world = sim.make_world(2, extent=90.0)
    g = np.random.default_rng(1)
    K, R, S = 64, SCSPEC.num_ring, SCSPEC.num_sector
    db = np.zeros((K, R, S), np.float32)
    p = np.array([10.0, 5.0, 0, 0, 0, 0.7], np.float32)
    xyz, _, m = scan_at(world, p, g)
    d = np.asarray(sc.make_descriptor(xyz, m, SCSPEC))
    # the only matching entry is RECENT → must not fire
    db[35] = d
    res = sc.detect_loop(jnp.asarray(d), jnp.asarray(db), jnp.int32(40), SCSPEC)
    assert not bool(res.found)


def test_isc_detects_revisit(rng):
    world = sim.make_world(2, extent=90.0)
    g = np.random.default_rng(1)
    K = 64
    db = np.zeros((K, ISPEC.num_ring, ISPEC.num_sector), np.float32)
    positions = np.zeros((K, 3), np.float32)
    travel = np.zeros(K, np.float32)
    # trajectory: away and back (revisit index 0 at index 30)
    t = 0.0
    prev = None
    for i in range(31):
        if i <= 15:
            pos = np.array([2.0 * i, 0.0, 0.0], np.float32)
        else:
            pos = np.array([2.0 * (30 - i), 0.0, 0.0], np.float32)
        pose = np.array([pos[0], pos[1], pos[2], 0, 0, 0], np.float32)
        xyz, inten, m = scan_at(world, pose, g)
        db[i] = np.asarray(isc_ops.make_descriptor(xyz, jnp.asarray(inten), m, ISPEC))
        if prev is not None:
            t += np.linalg.norm(pos - prev)
        travel[i] = t
        positions[i] = pos
        prev = pos
    res = isc_ops.detect_loop(jnp.asarray(db[30]), jnp.asarray(db), jnp.int32(31),
                              jnp.asarray(positions), jnp.asarray(travel), ISPEC)
    assert bool(res.found)
    assert int(res.idx) in (0, 1)  # revisit of the start


def test_isc_gating_blocks_neighbors(rng):
    """Consecutive nearby frames must never be loop candidates."""
    world = sim.make_world(2, extent=90.0)
    g = np.random.default_rng(1)
    K = 16
    db = np.zeros((K, ISPEC.num_ring, ISPEC.num_sector), np.float32)
    positions = np.zeros((K, 3), np.float32)
    travel = np.zeros(K, np.float32)
    for i in range(10):
        pose = np.array([1.0 * i, 0, 0, 0, 0, 0], np.float32)
        xyz, inten, m = scan_at(world, pose, g)
        db[i] = np.asarray(isc_ops.make_descriptor(xyz, jnp.asarray(inten), m, ISPEC))
        positions[i] = pose[:3]
        travel[i] = float(i)
    res = isc_ops.detect_loop(jnp.asarray(db[9]), jnp.asarray(db), jnp.int32(10),
                              jnp.asarray(positions), jnp.asarray(travel), ISPEC)
    assert not bool(res.found)


def test_isc_async_query_uses_own_frame_gates(rng):
    """With `cur=k` (the async loop-worker case: the query frame lags the
    database head), gating must use frame k's position/travel — not the
    newest frame's — and frame k must never match itself. Regression for the
    round-3 review finding: detect_loop hardwired cur = db_count-1."""
    world = sim.make_world(2, extent=90.0)
    g = np.random.default_rng(1)
    K = 64
    db = np.zeros((K, ISPEC.num_ring, ISPEC.num_sector), np.float32)
    positions = np.zeros((K, 3), np.float32)
    travel = np.zeros(K, np.float32)
    t, prev = 0.0, None
    # away-and-back (revisit start at i=30), then WANDER OFF (i=31..35):
    # the newest frames are far from everything
    path = [np.array([2.0 * i, 0.0, 0.0]) if i <= 15
            else np.array([2.0 * (30 - i), 0.0, 0.0]) for i in range(31)]
    path += [np.array([0.0, 3.0 * j, 0.0]) for j in range(1, 6)]
    for i, pos in enumerate(path):
        pose = np.array([*pos, 0, 0, 0], np.float32)
        xyz, inten, m = scan_at(world, pose, g)
        db[i] = np.asarray(isc_ops.make_descriptor(xyz, jnp.asarray(inten),
                                                   m, ISPEC))
        if prev is not None:
            t += np.linalg.norm(pos - prev)
        travel[i] = t
        positions[i] = pos
        prev = pos
    n = len(path)
    # async detection for frame k=30 while the db head has advanced to n-1:
    # frame 30 revisits the start — must still be found, gated on ITS state
    res = isc_ops.detect_loop(jnp.asarray(db[30]), jnp.asarray(db),
                              jnp.int32(n), jnp.asarray(positions),
                              jnp.asarray(travel), ISPEC, cur=jnp.int32(30))
    assert bool(res.found) and int(res.idx) in (0, 1)
    # and the query itself (or anything newer) is never a candidate
    assert int(res.idx) < 30

    from xchu_slam_tpu.ops import scancontext as sc_ops
    scspec = sc_ops.ScSpec(dist_thresh=0.5)
    sc_db = np.asarray(np.random.default_rng(0).random((K, 20, 60)),
                       np.float32)
    sc_db[40] = sc_db[2]  # plant: frame 40 matches old frame 2
    r = sc_ops.detect_loop(jnp.asarray(sc_db[40]), jnp.asarray(sc_db),
                           jnp.int32(K), scspec, cur=jnp.int32(40))
    # recency exclusion is relative to the QUERY (40-30=10 newest-eligible
    # is index 10): frame 2 is eligible and must win; never self-match
    assert bool(r.found) and int(r.idx) == 2


def test_icp_recovers_transform(rng):
    world = sim.make_world(2, extent=90.0)
    g = np.random.default_rng(3)
    xyz, _, m = scan_at(world, np.zeros(6, np.float32), g, n=4096)
    true_pose = jnp.array([1.5, -0.8, 0.1, 0.02, -0.01, 0.15], jnp.float32)
    T_true = se3.pose_to_matrix(true_pose)
    tgt = se3.transform_points(T_true, xyz)
    res = icp.align(xyz, m, tgt, m, jnp.eye(4), icp.IcpSpec(max_iterations=60))
    T = np.asarray(res.T)
    np.testing.assert_allclose(T, np.asarray(T_true), atol=0.05)
    assert float(res.fitness) < 0.05


def test_icp_fitness_high_for_bad_match(rng):
    g = np.random.default_rng(4)
    a = jnp.asarray(g.uniform(-20, 20, (2048, 3)).astype(np.float32))
    b = jnp.asarray(g.uniform(-20, 20, (2048, 3)).astype(np.float32))
    m = jnp.ones(2048, bool)
    res = icp.align(a, m, b, m, jnp.eye(4), icp.IcpSpec(max_iterations=20))
    assert float(res.fitness) > 0.3  # reference acceptance gate would reject


def test_plateaued_error_moving_transform_not_converged(monkeypatch):
    """PCL transform-delta semantics (reference pgo_node.cpp:441-448 +
    setTransformationEpsilon(1e-6)): an ICP whose ERROR has plateaued but
    whose TRANSFORM keeps moving must NOT report converged. Mocked
    correspondences make every 'nearest neighbor' the source point shifted
    by a constant 0.1 m — Procrustes then translates by 0.1 m every
    iteration forever while the error stays bit-identical (plateaued)."""
    shift = jnp.array([0.1, 0.0, 0.0], jnp.float32)

    def fake_nearest(src, src_mask, tgt, tgt_mask, chunk):
        nn = src + shift[None, :]
        return nn, jnp.full((src.shape[0],), 0.01, jnp.float32)

    monkeypatch.setattr(icp, "_nearest", fake_nearest)
    g = np.random.default_rng(7)
    a = jnp.asarray(g.uniform(-10, 10, (256, 3)).astype(np.float32))
    m = jnp.ones(256, bool)
    res = icp.align(a, m, a, m, jnp.eye(4),
                    icp.IcpSpec(max_iterations=25, trans_eps=1e-6))
    assert int(res.iterations) == 25      # ran to the cap
    assert not bool(res.converged)        # old error-plateau exit said True


def test_settled_transform_converges_before_cap(monkeypatch):
    """Counterpart: when the mocked correspondence shift vanishes, the
    transform-delta criterion fires and the loop exits early, converged."""
    def fake_nearest(src, src_mask, tgt, tgt_mask, chunk):
        return src, jnp.full((src.shape[0],), 0.01, jnp.float32)

    monkeypatch.setattr(icp, "_nearest", fake_nearest)
    g = np.random.default_rng(8)
    a = jnp.asarray(g.uniform(-10, 10, (256, 3)).astype(np.float32))
    m = jnp.ones(256, bool)
    # max_iterations differs from the test above so the jit cache cannot
    # serve a trace closed over the other test's mocked correspondences
    res = icp.align(a, m, a, m, jnp.eye(4),
                    icp.IcpSpec(max_iterations=24, trans_eps=1e-6))
    assert int(res.iterations) < 24
    assert bool(res.converged)


def test_sc_yaw_sign_convention(rng):
    """res.yaw = ψ_cand − ψ_query (wrapped): the convention _verify_and_apply
    relies on when it initializes ICP's heading with −yaw."""
    world = sim.make_world(2, extent=90.0)
    g = np.random.default_rng(2)
    K, R, S = 64, SCSPEC.num_ring, SCSPEC.num_sector
    db = np.zeros((K, R, S), np.float32)
    psi_c, psi_q = 0.9, 0.1
    p_c = np.array([5.0, -3.0, 0, 0, 0, psi_c], np.float32)
    xyz, _, m = scan_at(world, p_c, g)
    db[0] = np.asarray(sc.make_descriptor(xyz, m, SCSPEC))
    p_q = p_c.copy()
    p_q[5] = psi_q
    xyz, _, m = scan_at(world, p_q, g)
    q = sc.make_descriptor(xyz, m, SCSPEC)
    res = sc.detect_loop(q, jnp.asarray(db), jnp.int32(40), SCSPEC)
    assert bool(res.found) and int(res.idx) == 0
    expect = psi_c - psi_q
    err = float(jnp.arctan2(jnp.sin(res.yaw - expect), jnp.cos(res.yaw - expect)))
    # sector quantization is 2π/60 ≈ 0.105 rad
    assert abs(err) < 0.2, (float(res.yaw), expect)
