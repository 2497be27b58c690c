"""io.prefetch: packed staging + threaded prefetch must reproduce make_cloud
exactly, in order, for ragged scan sizes (truncation and padding paths)."""

import numpy as np

from xchu_slam_tpu.io.prefetch import DeviceScanPrefetcher, ScanStager
from xchu_slam_tpu.types import make_cloud


def _ref(xyz, inten, capacity):
    return make_cloud(xyz, inten, capacity=capacity)


def test_stager_matches_make_cloud():
    rng = np.random.default_rng(0)
    st = ScanStager(capacity=64)
    for n in [10, 64, 90, 1]:
        xyz = rng.normal(size=(n, 3)).astype(np.float32)
        inten = rng.uniform(size=n).astype(np.float32)
        c = st.stage(xyz, inten)
        r = _ref(xyz, inten, 64)
        np.testing.assert_allclose(np.asarray(c.xyz), np.asarray(r.xyz))
        np.testing.assert_array_equal(np.asarray(c.mask), np.asarray(r.mask))
        np.testing.assert_allclose(
            np.asarray(c.intensity * c.mask), np.asarray(r.intensity * r.mask))


def test_stager_none_intensity():
    st = ScanStager(capacity=16)
    c = st.stage(np.ones((5, 3), np.float32), None)
    assert float(np.asarray(c.intensity).sum()) == 0.0
    assert int(np.asarray(c.mask).sum()) == 5


def test_prefetcher_order_and_values():
    rng = np.random.default_rng(1)
    scans = [(rng.normal(size=(n, 3)).astype(np.float32),
              rng.uniform(size=n).astype(np.float32))
             for n in [100, 200, 50, 300, 128, 128, 7, 33]]
    pf = DeviceScanPrefetcher(scans, capacity=128, depth=3, threads=2)
    assert len(pf) == len(scans)
    seen = 0
    for k, cloud in enumerate(pf):
        xyz, inten = scans[k]
        r = _ref(xyz, inten, 128)
        np.testing.assert_allclose(np.asarray(cloud.xyz), np.asarray(r.xyz))
        np.testing.assert_array_equal(np.asarray(cloud.mask),
                                      np.asarray(r.mask))
        seen += 1
    assert seen == len(scans)


def test_prefetcher_single_thread_depth1():
    rng = np.random.default_rng(2)
    scans = [(rng.normal(size=(20, 3)).astype(np.float32), None)
             for _ in range(5)]
    pf = DeviceScanPrefetcher([s[0] for s in scans], capacity=32,
                              depth=1, threads=1)
    out = list(pf)
    assert len(out) == 5
    for cloud, (xyz, _) in zip(out, scans):
        np.testing.assert_allclose(np.asarray(cloud.xyz)[:20], xyz)
