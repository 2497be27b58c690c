"""io.prefetch: packed staging + threaded prefetch must reproduce make_cloud
exactly, in order, for ragged scan sizes (truncation and padding paths)."""

import numpy as np

from xchu_slam_tpu.io.prefetch import DeviceScanPrefetcher, ScanStager
from xchu_slam_tpu.types import make_cloud


def _ref(xyz, inten, capacity):
    return make_cloud(xyz, inten, capacity=capacity)


def test_stager_matches_make_cloud():
    rng = np.random.default_rng(0)
    st = ScanStager(capacity=64, quantize=False)
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
    st = ScanStager(capacity=16, quantize=True)
    c = st.stage(np.ones((5, 3), np.float32), None)
    assert float(np.asarray(c.intensity).sum()) == 0.0
    assert int(np.asarray(c.mask).sum()) == 5


def test_prefetcher_order_and_values():
    rng = np.random.default_rng(1)
    scans = [(rng.normal(size=(n, 3)).astype(np.float32),
              rng.uniform(size=n).astype(np.float32))
             for n in [100, 200, 50, 300, 128, 128, 7, 33]]
    pf = DeviceScanPrefetcher(scans, capacity=128, depth=3, threads=2,
                              quantize=False)
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
                              depth=1, threads=1, quantize=False)
    out = list(pf)
    assert len(out) == 5
    for cloud, (xyz, _) in zip(out, scans):
        np.testing.assert_allclose(np.asarray(cloud.xyz)[:20], xyz)


# ---------------- quantized (int16 fixed-point) staging ------------------- #

def test_quant_stager_tolerance():
    """Quantized staging reproduces points to the 2 mm fixed-point grid and
    intensities to 1/255, with identical masks."""
    rng = np.random.default_rng(3)
    st = ScanStager(capacity=64, quantize=True, bucket=16)
    for n in [10, 64, 90, 1]:
        xyz = (rng.uniform(-60, 60, size=(n, 3))).astype(np.float32)
        inten = rng.uniform(size=n).astype(np.float32)
        c = st.stage(xyz, inten)
        r = _ref(xyz, inten, 64)
        assert c.xyz.shape == r.xyz.shape  # padded back to capacity
        np.testing.assert_allclose(np.asarray(c.xyz), np.asarray(r.xyz),
                                   atol=1.01e-3)
        np.testing.assert_array_equal(np.asarray(c.mask), np.asarray(r.mask))
        np.testing.assert_allclose(
            np.asarray(c.intensity * c.mask), np.asarray(r.intensity * r.mask),
            atol=0.51 / 255.0)


def test_quant_stager_nonfinite_clamps_to_rim():
    """NaN/inf points must stage to the int16 rim (~65.5 m) where the range
    crop drops them — never to garbage inside the map."""
    xyz = np.array([[np.nan, 1.0, 2.0],
                    [np.inf, -np.inf, 0.0],
                    [1.0, 2.0, 3.0]], np.float32)
    st = ScanStager(capacity=8, quantize=True, bucket=4)
    c = st.stage(xyz, None)
    got = np.asarray(c.xyz)
    assert np.all(np.isfinite(got))
    assert got[0, 0] > 65.0 and got[1, 0] > 65.0 and got[1, 1] < -65.0
    np.testing.assert_allclose(got[2], [1.0, 2.0, 3.0], atol=1.01e-3)


def test_quant_prefetcher_ragged_buckets():
    rng = np.random.default_rng(4)
    scans = [(rng.uniform(-50, 50, size=(n, 3)).astype(np.float32),
              rng.uniform(size=n).astype(np.float32))
             for n in [100, 200, 50, 300, 128, 7]]
    pf = DeviceScanPrefetcher(scans, capacity=128, depth=3, threads=2,
                              quantize=True)
    for k, cloud in enumerate(pf):
        xyz, inten = scans[k]
        r = _ref(xyz, inten, 128)
        assert cloud.xyz.shape == r.xyz.shape
        np.testing.assert_allclose(np.asarray(cloud.xyz), np.asarray(r.xyz),
                                   atol=1.01e-3)
        np.testing.assert_array_equal(np.asarray(cloud.mask),
                                      np.asarray(r.mask))
