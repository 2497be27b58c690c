"""io/procsource.ProcessScanSource: forked-worker scan production.

Contract under test: items are bit-identical to direct indexing (the
per-index rng makes RenderedScans order-independent), any access order the
chunked prefetcher produces is served, repeats/post-close fall back inline,
and the full device stream over a process source matches the in-thread
stream trajectory exactly."""

import numpy as np
import pytest

from xchu_slam_tpu.io.procsource import ProcessScanSource
from xchu_slam_tpu.utils import sim


@pytest.fixture(scope="module")
def scans():
    world = sim.make_world(1, extent=30.0, ground_pts=4000)
    gt = sim.loop_trajectory(n_scans=24, radius=8.0, speed=1.0)
    return sim.RenderedScans(world, gt, seed=5, n_points=2000)


def test_items_bit_identical(scans):
    with ProcessScanSource(scans, workers=2, readahead=8) as src:
        assert len(src) == len(scans)
        for k in range(len(scans)):
            xyz, inten = src[k]
            rx, ri = scans[k]
            np.testing.assert_array_equal(xyz, np.asarray(rx, np.float32))
            np.testing.assert_array_equal(inten, np.asarray(ri, np.float32))


def test_out_of_order_and_repeat_access(scans):
    with ProcessScanSource(scans, workers=2, readahead=16) as src:
        order = [3, 0, 1, 2, 7, 5, 4, 6]
        got = {k: src[k] for k in order}
        for k in order:
            np.testing.assert_array_equal(got[k][0],
                                          np.asarray(scans[k][0], np.float32))
        # repeat access: already served -> inline fallback, still correct
        xyz, _ = src[3]
        np.testing.assert_array_equal(xyz, np.asarray(scans[3][0], np.float32))


def test_post_close_fallback(scans):
    src = ProcessScanSource(scans, workers=1, readahead=4)
    src.close()
    xyz, _ = src[10]
    np.testing.assert_array_equal(xyz, np.asarray(scans[10][0], np.float32))


def test_stream_equivalence_through_prefetcher(scans):
    """DeviceChunkPrefetcher over a ProcessScanSource yields the same staged
    chunks as over the raw sequence."""
    from xchu_slam_tpu.io.prefetch import DeviceChunkPrefetcher

    ref = list(DeviceChunkPrefetcher(scans, capacity=2048, chunk=8,
                                     depth=2, threads=2))
    with ProcessScanSource(scans, workers=2, readahead=24) as src:
        got = list(DeviceChunkPrefetcher(src, capacity=2048, chunk=8,
                                         depth=2, threads=2))
    assert len(got) == len(ref)
    for (ca, na), (cb, nb) in zip(ref, got):
        assert na == nb
        np.testing.assert_array_equal(np.asarray(ca.xyz), np.asarray(cb.xyz))
        np.testing.assert_array_equal(np.asarray(ca.mask), np.asarray(cb.mask))
