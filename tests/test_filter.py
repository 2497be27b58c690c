"""Direct oracle tests for the filter front-end ops (ops/filter.py).

The pipelines exercise filter_scan end-to-end; these pin the outlier-removal
math against NumPy brute force, including the hierarchical top_k path of
statistical_outlier_removal (segments engage when rows exceed ~2k columns)."""

import numpy as np

import jax.numpy as jnp

from xchu_slam_tpu.ops import filter as fops
from xchu_slam_tpu.types import Cloud


def _cloud(n, rng, n_pad=0):
    xyz = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    # a few blatant outliers far from everything
    xyz[: max(n // 100, 3)] += 500.0
    mask = np.ones(n + n_pad, bool)
    mask[n:] = False
    xyz = np.vstack([xyz, np.zeros((n_pad, 3), np.float32)])
    return Cloud(xyz=jnp.asarray(xyz),
                 intensity=jnp.zeros(n + n_pad, jnp.float32),
                 mask=jnp.asarray(mask))


def _stat_oracle(xyz, mask, k, stddev_mult):
    """NumPy brute-force statistical outlier removal (PCL semantics)."""
    pts = xyz[mask]
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    d_sorted = np.sort(d, axis=1)
    mean_d = d_sorted[:, 1:k + 1].mean(axis=1)   # exclude self
    mu, sd = mean_d.mean(), mean_d.std()
    keep_valid = mean_d <= mu + stddev_mult * sd
    keep = np.zeros(len(xyz), bool)
    keep[np.flatnonzero(mask)] = keep_valid
    return keep


def test_statistical_outlier_matches_bruteforce_small():
    rng = np.random.default_rng(0)
    cl = _cloud(300, rng, n_pad=50)
    out = fops.statistical_outlier_removal(cl, 10, 1.0, chunk=128)
    want = _stat_oracle(np.asarray(cl.xyz), np.asarray(cl.mask), 10, 1.0)
    np.testing.assert_array_equal(np.asarray(out.mask), want)


def test_statistical_outlier_hierarchical_matches_bruteforce():
    """4096 points → 4 segments of 1024: the hierarchical top_k path must be
    EXACT (k smallest of the union of per-segment k-smallest)."""
    rng = np.random.default_rng(1)
    cl = _cloud(4096, rng)
    out = fops.statistical_outlier_removal(cl, 30, 1.0, chunk=2048)
    want = _stat_oracle(np.asarray(cl.xyz), np.asarray(cl.mask), 30, 1.0)
    np.testing.assert_array_equal(np.asarray(out.mask), want)


def _downsampled_cloud(n, rng, voxel=0.5, n_pad=0, extent=25.0):
    """Voxel-downsample-like cloud: ≤1 point per `voxel` cell (what the
    bucketed filter sees inside filter_scan), surfaces + sparse outliers."""
    # ground plane + two walls, snapped to distinct voxel cells w/ jitter
    g = rng.uniform(-extent, extent, (n, 2)).astype(np.float32)
    xyz = np.concatenate([g, np.full((n, 1), -1.7, np.float32)], axis=1)
    wall = rng.random(n) < 0.3
    xyz[wall, 2] = rng.uniform(-1.5, 2.5, wall.sum())
    xyz[wall, 1] = np.sign(xyz[wall, 1]) * extent
    cell = np.floor(xyz / voxel).astype(np.int64)
    _, first = np.unique(
        cell[:, 0] * 10_000_000 + cell[:, 1] * 1000 + cell[:, 2],
        return_index=True)
    keep = np.zeros(n, bool)
    keep[first] = True
    xyz = xyz[keep]
    # centroid-like: anywhere inside the cell
    xyz = (np.floor(xyz / voxel) * voxel
           + rng.uniform(0.05, 0.45, xyz.shape).astype(np.float32) * voxel)
    n_out = max(len(xyz) // 50, 4)
    xyz[:n_out] += rng.uniform(5, 40, (n_out, 3)) * np.sign(
        rng.standard_normal((n_out, 3)))
    m = len(xyz)
    mask = np.ones(m + n_pad, bool)
    mask[m:] = False
    xyz = np.vstack([xyz, np.zeros((n_pad, 3), np.float32)]).astype(np.float32)
    return Cloud(xyz=jnp.asarray(xyz),
                 intensity=jnp.zeros(m + n_pad, jnp.float32),
                 mask=jnp.asarray(mask))


def test_statistical_bucketed_dense_resolves_in_buckets():
    """KITTI-density cloud (the design's operating point, ~5 pts/m²):
    d_30 < bucket_size for almost every row, so a SMALL fallback capacity
    must suffice for exactness — proves the proven-resolved path (d_k <
    bucket_size coverage argument) does the work, not the fallback."""
    rng = np.random.default_rng(3)
    cl = _downsampled_cloud(9000, rng, n_pad=317, extent=15.0)
    out = fops.statistical_outlier_removal_bucketed(
        cl, 30, 1.0, bucket_size=2.0, cap=64, fallback_rows=512)
    want = _stat_oracle(np.asarray(cl.xyz), np.asarray(cl.mask), 30, 1.0)
    np.testing.assert_array_equal(np.asarray(out.mask), want)


def test_statistical_bucketed_sparse_exact_via_fallback():
    """Sparse cloud (sim density, d_30 often ≥ bucket_size): unproven rows
    route through the exact fallback; with capacity ≥ N the result is exact
    regardless of density."""
    rng = np.random.default_rng(4)
    cl = _downsampled_cloud(1500, rng, n_pad=50)
    out = fops.statistical_outlier_removal_bucketed(
        cl, 8, 0.8, bucket_size=1.5, cap=27, fallback_rows=cl.xyz.shape[0])
    want = _stat_oracle(np.asarray(cl.xyz), np.asarray(cl.mask), 8, 0.8)
    np.testing.assert_array_equal(np.asarray(out.mask), want)


def test_statistical_bucketed_far_outliers_fallback():
    """Blatant far outliers land in sparse / lattice-edge buckets → the
    exact-fallback path must still classify them identically to brute
    force (uses points beyond the clipped lattice extent)."""
    rng = np.random.default_rng(5)
    cl = _cloud(800, rng, n_pad=40)        # includes +500 m outliers
    out = fops.statistical_outlier_removal_bucketed(
        cl, 10, 1.0, bucket_size=2.0, cap=64, fallback_rows=800)
    want = _stat_oracle(np.asarray(cl.xyz), np.asarray(cl.mask), 10, 1.0)
    np.testing.assert_array_equal(np.asarray(out.mask), want)


def test_filter_scan_bucketed_matches_statistical():
    """filter_scan's two statistical paths (fused all-pairs vs spatially
    bucketed) must agree end-to-end on dense input where buckets resolve."""
    from xchu_slam_tpu.config import FilterConfig

    rng = np.random.default_rng(6)
    xyz = rng.uniform(-15, 15, (8192, 3)).astype(np.float32)
    xyz[:, 2] = np.abs(xyz[:, 2]) * 0.05 - 1.6
    xyz[:80] += 200.0
    inten = rng.random(8192).astype(np.float32)
    from xchu_slam_tpu.types import make_cloud
    cl = make_cloud(xyz, inten, capacity=8192)
    kw = dict(max_raw_points=8192, max_points=4096)
    out_b = fops.filter_scan(
        cl, FilterConfig(outlier_method="statistical_bucketed", **kw))
    out_f = fops.filter_scan(cl, FilterConfig(outlier_method="statistical",
                                              **kw))
    np.testing.assert_array_equal(np.asarray(out_b.mask),
                                  np.asarray(out_f.mask))
    np.testing.assert_allclose(np.asarray(out_b.xyz), np.asarray(out_f.xyz),
                               atol=1e-6)


def test_statistical_bucketed_overflow_keeps_unknown_rows():
    """Rows beyond the fallback capacity must be KEPT (graceful failure),
    never dropped: a sparse cloud with a tiny fallback budget retains ≈ all
    its legitimate points (regression: inf means once deleted half the
    cloud and decimated downstream ICP)."""
    rng = np.random.default_rng(9)
    cl = _downsampled_cloud(1200, rng)   # sparse: most rows unresolved
    out = fops.statistical_outlier_removal_bucketed(
        cl, 30, 1.0, bucket_size=2.0, cap=64, fallback_rows=8)
    n_in = int(np.asarray(cl.mask).sum())
    n_out = int(np.asarray(out.mask).sum())
    assert n_out >= 0.9 * n_in, (n_out, n_in)


def test_radius_outlier_matches_bruteforce():
    rng = np.random.default_rng(2)
    cl = _cloud(400, rng, n_pad=24)
    out = fops.radius_outlier_removal(cl, 3.0, 4, chunk=128)
    xyz = np.asarray(cl.xyz)
    mask = np.asarray(cl.mask)
    pts = xyz[mask]
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    cnt = (d < 3.0).sum(axis=1) - 1
    want = np.zeros(len(xyz), bool)
    want[np.flatnonzero(mask)] = cnt >= 4
    np.testing.assert_array_equal(np.asarray(out.mask), want)


def test_statistical_approx_agrees_with_exact(rng):
    """statistical_approx (TPU hardware approx_min_k; exact fallback on CPU)
    must keep near-identical point sets to the exact filter — the mean-kNN
    bias from missed neighbors moves both the rows and the threshold."""
    import jax.numpy as jnp

    from xchu_slam_tpu.ops.filter import statistical_outlier_removal
    from xchu_slam_tpu.types import make_cloud

    pts = rng.normal(0, 10, (2048, 3)).astype(np.float32)
    pts[:32] += rng.normal(0, 80, (32, 3))          # gross outliers
    cl = make_cloud(pts)
    exact = statistical_outlier_removal(cl, k=30, stddev_mult=1.0)
    approx = statistical_outlier_removal(cl, k=30, stddev_mult=1.0,
                                         approx=True)
    a = np.asarray(exact.mask)
    b = np.asarray(approx.mask)
    agree = (a == b).mean()
    assert agree > 0.98, f"keep-mask agreement {agree:.3f}"
    # both must drop most of the gross outliers
    assert np.asarray(exact.mask)[:32].sum() <= 8
    assert np.asarray(approx.mask)[:32].sum() <= 8
