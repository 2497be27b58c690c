import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.config import FilterConfig
from xchu_slam_tpu.models import odometry
from xchu_slam_tpu.ops import ndt, voxel_map as vm
from xchu_slam_tpu.ops.filter import filter_scan
from xchu_slam_tpu.types import make_cloud
from xchu_slam_tpu.utils import metrics, sim

GSPEC = vm.GridSpec(gx=72, gy=72, gz=16, resolution=2.0, min_points=6,
                    eig_inflation=0.01)
SPEC = odometry.OdomSpec(
    gspec=GSPEC,
    nspec=ndt.NdtSpec(max_iterations=30),
    min_add_scan_shift=0.5,
    max_localmap_size=5.0,
    recentre_margin=20.0,
)
FCFG = FilterConfig(max_raw_points=16384, max_points=4096, outlier_method="none")


def run_sequence(n_scans=40, speed=1.0, seed=3):
    world = sim.make_world(seed, extent=90.0, ground_pts=60_000)
    poses = sim.loop_trajectory(n_scans=400, radius=55.0, speed=speed)[:n_scans]
    rng = np.random.default_rng(seed)
    est = []
    state = None
    for i, p in enumerate(poses):
        xyz, inten = sim.render_scan(world, p, rng, n_points=12_000)
        cloud = make_cloud(xyz, inten, capacity=FCFG.max_raw_points)
        filt = filter_scan(cloud, FCFG)
        if state is None:
            state = odometry.init_state(SPEC, jnp.asarray(p), filt.xyz, filt.mask)
            est.append(p.copy())
            continue
        state, out = odometry.step(state, filt.xyz, filt.mask, SPEC)
        est.append(np.asarray(out.pose))
    return np.array(est), poses


def test_odometry_tracks_trajectory():
    est, gt = run_sequence(n_scans=40)
    ate = metrics.ape_rmse(est[:, :3], gt[:, :3], align=False)
    # 40 scans ≈ 40 m of travel; odometry alone must stay well under 0.5 m RMSE
    assert ate < 0.5, f"odometry ATE {ate:.3f} m"
    # headings must track too
    yaw_err = np.abs(np.unwrap(est[:, 5]) - np.unwrap(gt[:, 5]))
    assert yaw_err.max() < 0.05


def test_odometry_localmap_maintenance():
    """Inserts every ~0.5 m and swaps every ~5 m of travel."""
    world = sim.make_world(5, extent=90.0, ground_pts=60_000)
    poses = sim.loop_trajectory(n_scans=400, radius=55.0, speed=1.0)[:14]
    rng = np.random.default_rng(5)
    state = None
    inserts = swaps = 0
    for p in poses:
        xyz, inten = sim.render_scan(world, p, rng, n_points=10_000)
        filt = filter_scan(make_cloud(xyz, inten, capacity=FCFG.max_raw_points), FCFG)
        if state is None:
            state = odometry.init_state(SPEC, jnp.asarray(p), filt.xyz, filt.mask)
            continue
        state, out = odometry.step(state, filt.xyz, filt.mask, SPEC)
        inserts += int(out.inserted)
        swaps += int(out.swapped)
    # ~1 m/scan → inserted nearly every scan; ~13 m travelled → ≥2 swaps
    assert inserts >= 10
    assert swaps >= 2
    assert float(vm.occupied_count(state.grid_a)) > 100
