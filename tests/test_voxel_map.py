import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.ops import voxel_map as vm


SPEC = vm.GridSpec(gx=16, gy=16, gz=8, resolution=2.0, min_points=6,
                   eig_inflation=0.01)


def _brute_force_stats(pts, origin, spec):
    """NumPy oracle: per-voxel mean/cov."""
    idx = np.floor((pts - origin) / spec.resolution).astype(int)
    out = {}
    for i, p in zip(map(tuple, idx), pts):
        if all(0 <= i[d] < (spec.gx, spec.gy, spec.gz)[d] for d in range(3)):
            out.setdefault(i, []).append(p)
    stats = {}
    for k, v in out.items():
        v = np.array(v)
        mu = v.mean(0)
        cov = np.cov(v.T, bias=False) if len(v) > 1 else np.zeros((3, 3))
        stats[k] = (len(v), mu, cov)
    return stats


def test_insert_finalize_matches_bruteforce(rng):
    origin = np.array([-16.0, -16.0, -8.0], np.float32)
    pts = rng.uniform(-14, 14, (8000, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-6, 6, 8000)
    grid = vm.make_grid(SPEC, origin)
    grid = vm.insert_points(grid, jnp.asarray(pts), jnp.ones(8000, bool), SPEC)
    grid = vm.finalize(grid, SPEC)

    oracle = _brute_force_stats(pts.astype(np.float64), origin, SPEC)
    n = np.asarray(grid.n)
    base = np.asarray(vm.unpack_base(grid.fin, SPEC))  # interior [V,10] view
    mean, valid = base[:, 0:3], base[:, 9] > 0.0
    checked = 0
    for (ix, iy, iz), (cnt, mu, cov) in oracle.items():
        f = (ix * SPEC.gy + iy) * SPEC.gz + iz
        assert n[f] == cnt
        assert valid[f] == (cnt >= SPEC.min_points)
        if valid[f]:
            corner = origin + np.array([ix, iy, iz]) * SPEC.resolution
            np.testing.assert_allclose(mean[f] + corner, mu, atol=1e-3)
            checked += 1
    assert checked > 20


def test_icov_matches_inflated_inverse(rng):
    """Dense voxel: icov must equal inv of (possibly inflated) sample cov."""
    origin = np.zeros(3, np.float32)
    pts = (rng.normal(0, 0.4, (200, 3)) + np.array([3.0, 3.0, 3.0])).astype(np.float32)
    grid = vm.make_grid(SPEC, origin)
    grid = vm.insert_points(grid, jnp.asarray(pts), jnp.ones(200, bool), SPEC)
    grid = vm.finalize(grid, SPEC)
    f = (1 * SPEC.gy + 1) * SPEC.gz + 1
    base = np.asarray(vm.unpack_base(grid.fin, SPEC))
    assert base[f, 9] > 0.0
    inside = pts[np.all((pts >= 2.0) & (pts < 4.0), axis=1)]
    cov = np.cov(inside.T, bias=False)
    icov_got = base[f, 3:9]
    from xchu_slam_tpu.utils.linalg import sym6_to_mat

    got = np.asarray(sym6_to_mat(jnp.asarray(icov_got)))
    np.testing.assert_allclose(got @ cov, np.eye(3), atol=0.05)


def test_incremental_equals_batch(rng):
    """insert(A); insert(B) == insert(A∪B) — the updateVoxelGrid semantics."""
    origin = np.array([-16.0, -16.0, -8.0], np.float32)
    a = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    b = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    g1 = vm.make_grid(SPEC, origin)
    g1 = vm.insert_points(g1, jnp.asarray(a), jnp.ones(500, bool), SPEC)
    g1 = vm.insert_points(g1, jnp.asarray(b), jnp.ones(500, bool), SPEC)
    g1 = vm.finalize(g1, SPEC)
    g2 = vm.make_grid(SPEC, origin)
    g2 = vm.insert_points(g2, jnp.asarray(np.vstack([a, b])), jnp.ones(1000, bool), SPEC)
    g2 = vm.finalize(g2, SPEC)
    np.testing.assert_allclose(np.asarray(g1.n), np.asarray(g2.n))
    np.testing.assert_allclose(np.asarray(g1.mean), np.asarray(g2.mean), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1.icov), np.asarray(g2.icov), atol=1e-2)


def test_masked_points_ignored(rng):
    origin = np.zeros(3, np.float32)
    pts = rng.uniform(0, 10, (100, 3)).astype(np.float32)
    mask = np.zeros(100, bool)
    grid = vm.make_grid(SPEC, origin)
    grid = vm.insert_points(grid, jnp.asarray(pts), jnp.asarray(mask), SPEC)
    assert float(jnp.sum(grid.n)) == 0.0


def test_out_of_bounds_dropped(rng):
    origin = np.zeros(3, np.float32)
    pts = np.array([[1000.0, 0, 0], [-5.0, 0, 0], [1.0, 1.0, 1.0]], np.float32)
    grid = vm.make_grid(SPEC, origin)
    grid = vm.insert_points(grid, jnp.asarray(pts), jnp.ones(3, bool), SPEC)
    assert float(jnp.sum(grid.n)) == 1.0


def test_recentre_preserves_overlap(rng):
    origin = vm.centered_origin(SPEC, np.zeros(3))
    pts = rng.uniform(-8, 8, (800, 3)).astype(np.float32)
    grid = vm.make_grid(SPEC, origin)
    grid = vm.insert_points(grid, jnp.asarray(pts), jnp.ones(800, bool), SPEC)
    grid = vm.finalize(grid, SPEC)
    before_total = float(jnp.sum(grid.n))
    # read before recentre: insert/finalize/recentre donate their input grid
    mw_b, _, vb = vm.lookup7(grid, SPEC, jnp.asarray(pts[:50]))

    moved = vm.recentre(grid, jnp.array([4.0, 2.0, 0.0]), SPEC)
    moved = vm.finalize(moved, SPEC)
    # all points still in bounds after a small shift → mass preserved
    assert float(jnp.sum(moved.n)) == before_total
    # voxel stats must be identical where defined: compare world-frame means
    mw_a, _, va = vm.lookup7(moved, SPEC, jnp.asarray(pts[:50]))
    np.testing.assert_array_equal(np.asarray(vb), np.asarray(va))
    sel = np.asarray(vb)
    np.testing.assert_allclose(
        np.asarray(mw_b)[sel], np.asarray(mw_a)[sel], atol=1e-3
    )


def test_lookup7_neighborhood(rng):
    origin = np.zeros(3, np.float32)
    # fill two adjacent voxels densely
    a = (rng.uniform(0, 2, (50, 3))).astype(np.float32)
    b = (rng.uniform(0, 2, (50, 3)) + np.array([2.0, 0, 0])).astype(np.float32)
    grid = vm.make_grid(SPEC, origin)
    grid = vm.insert_points(grid, jnp.asarray(np.vstack([a, b])), jnp.ones(100, bool), SPEC)
    grid = vm.finalize(grid, SPEC)
    q = jnp.array([[1.0, 1.0, 1.0]], jnp.float32)
    mean_w, icov, valid = vm.lookup7(grid, SPEC, q)
    assert valid.shape == (1, 7)
    # centre voxel and +x neighbor valid, others empty
    v = np.asarray(valid)[0]
    assert v[0] and v[1]
    assert not v[2] and not v[3]
    np.testing.assert_allclose(np.asarray(mean_w)[0, 0], a.mean(0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(mean_w)[0, 1], b.mean(0), atol=1e-3)


def test_grid_points_roundtrip(rng):
    origin = np.zeros(3, np.float32)
    pts = (rng.uniform(0, 2, (50, 3)) + np.array([6.0, 6.0, 2.0])).astype(np.float32)
    grid = vm.make_grid(SPEC, origin)
    grid = vm.insert_points(grid, jnp.asarray(pts), jnp.ones(50, bool), SPEC)
    grid = vm.finalize(grid, SPEC)
    means, mask = vm.grid_points(grid, SPEC)
    sel = np.asarray(mask)
    assert sel.sum() == 1
    np.testing.assert_allclose(np.asarray(means)[sel][0], pts.mean(0), atol=1e-3)


def test_insert_points_pair_matches_separate(rng):
    """The fused A/B scatter must equal two separate inserts (identical
    origins — the odometry invariant)."""
    origin = np.array([-16.0, -16.0, -8.0], np.float32)
    pts = rng.uniform(-10, 10, (2000, 3)).astype(np.float32)
    mask = jnp.asarray(rng.random(2000) < 0.9)
    ga1 = vm.make_grid(SPEC, origin)
    gb1 = vm.make_grid(SPEC, origin)
    # pre-populate B differently so the pair insert must preserve each
    # grid's own accumulators
    pre = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    gb1 = vm.insert_points(gb1, jnp.asarray(pre), jnp.ones(500, bool), SPEC)
    ga2, gb2 = vm.make_grid(SPEC, origin), vm.make_grid(SPEC, origin)
    gb2 = vm.insert_points(gb2, jnp.asarray(pre), jnp.ones(500, bool), SPEC)

    ga1 = vm.insert_points(ga1, jnp.asarray(pts), mask, SPEC)
    gb1 = vm.insert_points(gb1, jnp.asarray(pts), mask, SPEC)
    ga2, gb2 = vm.insert_points_pair(ga2, gb2, jnp.asarray(pts), mask, SPEC)
    np.testing.assert_allclose(np.asarray(ga1.stats), np.asarray(ga2.stats),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb1.stats), np.asarray(gb2.stats),
                               atol=1e-4)
