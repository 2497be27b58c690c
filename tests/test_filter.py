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
