import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.models import batch_odometry, odometry
from xchu_slam_tpu.ops import ndt, voxel_map as vm
from xchu_slam_tpu.utils import sim

GSPEC = vm.GridSpec(gx=48, gy=48, gz=12, resolution=2.0, min_points=6,
                    eig_inflation=0.01)
SPEC = odometry.OdomSpec(
    gspec=GSPEC, nspec=ndt.NdtSpec(max_iterations=20),
    min_add_scan_shift=0.5, max_localmap_size=5.0, recentre_margin=10.0)


def test_batch_matches_single():
    """B=3 batched odometry must track each sequence like single-sequence."""
    B, n_scans, n_pts = 3, 6, 4096
    worlds = [sim.make_world(s, extent=70.0, ground_pts=40_000) for s in range(B)]
    trajs = [sim.loop_trajectory(n_scans=40, radius=30.0 + 5 * s, speed=1.0)[:n_scans]
             for s in range(B)]
    rngs = [np.random.default_rng(s) for s in range(B)]

    def scan(b, i):
        xyz, _ = sim.render_scan(worlds[b], trajs[b][i], rngs[b], n_points=6000)
        out = np.zeros((n_pts, 3), np.float32)
        m = np.zeros(n_pts, bool)
        n = min(len(xyz), n_pts)
        out[:n] = xyz[:n]
        m[:n] = True
        return out, m

    scans = [[scan(b, i) for i in range(n_scans)] for b in range(B)]

    # single-sequence references
    singles = []
    for b in range(B):
        st = odometry.init_state(SPEC, jnp.asarray(trajs[b][0]),
                                 jnp.asarray(scans[b][0][0]),
                                 jnp.asarray(scans[b][0][1]))
        poses = []
        for i in range(1, n_scans):
            st, out = odometry.step(st, jnp.asarray(scans[b][i][0]),
                                    jnp.asarray(scans[b][i][1]), SPEC)
            poses.append(np.asarray(out.pose))
        singles.append(np.array(poses))

    # batched
    init_poses = jnp.asarray(np.stack([trajs[b][0] for b in range(B)]))
    xyz0 = jnp.asarray(np.stack([scans[b][0][0] for b in range(B)]))
    m0 = jnp.asarray(np.stack([scans[b][0][1] for b in range(B)]))
    states = batch_odometry.batch_init(SPEC, init_poses, xyz0, m0)
    batched = []
    for i in range(1, n_scans):
        xi = jnp.asarray(np.stack([scans[b][i][0] for b in range(B)]))
        mi = jnp.asarray(np.stack([scans[b][i][1] for b in range(B)]))
        states, out = batch_odometry.batch_step(states, xi, mi, SPEC)
        batched.append(np.asarray(out.pose))
    batched = np.stack(batched, axis=1)  # [B, n_scans-1, 6]

    for b in range(B):
        # while_loop under vmap shares trip counts across the batch, so the
        # optimizer paths differ slightly — both must track ground truth
        gt = trajs[b][1:n_scans]
        err_single = np.linalg.norm(singles[b][:, :2] - gt[:, :2], axis=1)
        err_batch = np.linalg.norm(batched[b][:, :2] - gt[:, :2], axis=1)
        assert err_single.max() < 0.3, (b, err_single)
        assert err_batch.max() < 0.3, (b, err_batch)
