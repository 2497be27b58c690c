"""GPS altitude factor exercised end-to-end (reference GPSFactor,
pgo_node.cpp:104-111,279-287 — altitude-only, x/y noise 1e9).

Drift injection: each scan is RENDERED from a pose whose z is displaced by a
growing bias, so the odometry faithfully tracks a z-drifting world — the
classic altimeter-correctable failure. GPS altitudes are the TRUE altitude
plus noise and dropouts; with `pgo.use_gps` the optimized keyframe altitudes
must come back toward the truth."""

import numpy as np
import pytest

from xchu_slam_tpu.config import default_config
from xchu_slam_tpu.models import device_pipeline as dp
from xchu_slam_tpu.types import make_cloud
from xchu_slam_tpu.utils import sim


def _cfg(**over):
    base = {
        "filter.max_raw_points": 4096,
        "filter.max_points": 2048,
        "filter.outlier_method": "none",
        "ndt.grid_x": 48, "ndt.grid_y": 48, "ndt.grid_z": 16,
        "pgo.max_keyframes": 64, "pgo.max_loops": 8,
        "pgo.keyframe_gap": 1.0,
        "loop.method": "none",
        # z drift is a soft mode of the between-chain: altitude factors must
        # win against the (drift-encoding) odometry z increments, so the test
        # uses a tighter altimeter than the reference's 250 m variance and a
        # looser odometry prior — the MECHANISM under test is identical
        "pgo.odom_noise_trans": 1e-2,
        "pgo.gps_noise_alt": 0.25,
        "loop.submap_half_width": 4, "loop.submap_points": 2048,
    }
    base.update(over)
    return default_config().override(base)


@pytest.fixture(scope="module")
def drifting_scans():
    n = 70
    world = sim.make_world(6, extent=80.0, ground_pts=40000)
    gt = sim.loop_trajectory(n_scans=n, radius=20.0, speed=1.2)
    drift = 0.02 * np.arange(n)            # 1.4 m of z drift by the end
    rng = np.random.default_rng(11)
    scans = []
    for i, p in enumerate(gt):
        p_drift = p.copy()
        p_drift[2] += drift[i]
        scans.append(sim.render_scan(world, p_drift, rng, n_points=3000))
    return gt, drift, scans


def _run(cfg, scans, gps_alts):
    pipe = dp.DeviceSlamPipeline(cfg, kf_points=1024, log_capacity=128)
    for i, (xyz, inten) in enumerate(scans):
        cl = make_cloud(xyz, inten, capacity=cfg.filter.max_raw_points)
        alt = None
        if gps_alts is not None and np.isfinite(gps_alts[i]):
            alt = float(gps_alts[i])
        pipe.process_scan(cl, stamp=0.1 * i, gps_alt=alt)
    pipe.finalize()
    return pipe


def test_gps_factor_corrects_z_drift(drifting_scans):
    gt, drift, scans = drifting_scans
    n = len(scans)
    rng = np.random.default_rng(3)
    gps = gt[:, 2] + rng.normal(0.0, 0.2, n)   # true altitude, noisy
    gps[rng.random(n) < 0.2] = np.nan          # 20% dropout

    off = _run(_cfg(), scans, None)
    on = _run(_cfg(**{"pgo.use_gps": True}), scans, gps)

    # both runs see the same drifting world → raw odometry drifts identically
    zo = off.odometry_trajectory()[:, 2]
    assert zo[-1] > 0.6 * drift[-1], "drift injection failed to register"

    def z_rmse(pipe):
        stamps, _, opt = pipe.keyframe_trajectory()
        idx = np.rint(np.asarray(stamps) / 0.1).astype(int)
        return float(np.sqrt(np.mean((opt[:, 2] - gt[idx, 2]) ** 2)))

    r_off, r_on = z_rmse(off), z_rmse(on)
    assert r_on < 0.5 * r_off, \
        f"GPS failed to correct z drift: {r_on:.3f} vs {r_off:.3f} m"
    # sanity: GPS factors actually landed in the graph
    assert int(np.sum(np.asarray(on.graph.gps_mask))) >= 10


def test_gps_chunk_path_matches_per_scan(drifting_scans):
    """process_chunk(gps_alts=…) (NaN = dropout) must reproduce the per-scan
    gps_alt feed exactly."""
    import jax
    import jax.numpy as jnp

    gt, _, scans = drifting_scans
    scans = scans[:24]
    n = len(scans)
    rng = np.random.default_rng(5)
    gps = gt[:n, 2] + rng.normal(0.0, 0.2, n)
    gps[rng.random(n) < 0.25] = np.nan
    cfg = _cfg(**{"pgo.use_gps": True})

    ref = _run(cfg, scans, gps)

    pipe = dp.DeviceSlamPipeline(cfg, kf_points=1024, log_capacity=128)
    chunk = 8
    for base in range(0, n, chunk):
        idx = np.minimum(base + np.arange(chunk), n - 1)
        n_real = min(chunk, n - base)
        clouds = [make_cloud(*scans[j], capacity=cfg.filter.max_raw_points)
                  for j in idx]
        batch = jax.tree.map(lambda *a: jnp.stack(a), *clouds)
        pipe.process_chunk(batch, 0.1 * idx, n_real, gps_alts=gps[idx])
    pipe.finalize()

    np.testing.assert_array_equal(pipe.odometry_trajectory(),
                                  ref.odometry_trajectory())
    np.testing.assert_array_equal(np.asarray(pipe.graph.gps_mask),
                                  np.asarray(ref.graph.gps_mask))
    np.testing.assert_allclose(
        np.asarray(pipe.db.opt_poses[:pipe.kf_count]),
        np.asarray(ref.db.opt_poses[:ref.kf_count]), atol=1e-6)
