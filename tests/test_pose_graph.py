import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.models import pose_graph as pg
from xchu_slam_tpu.utils import se3

SPEC = pg.GraphSpec(max_keyframes=64, max_loops=8, gn_iterations=6,
                    cg_iterations=60)
# NOTE: the reference's odometry variances (1e-6) make loop factors nearly
# inert (its README admits loops "don't hugely improve accuracy"). To exercise
# the loop machinery, these tests use balanced weights; the config default
# still mirrors the reference.
SOFT = SPEC._replace(odom_info_t=100.0, odom_info_r=100.0)


def chain_graph(rng, n, drift_t=0.02, drift_r=0.002):
    """Ground-truth circuit + noisy odometry chain. Returns (gt6, odo6, graph)."""
    K = SPEC.max_keyframes
    gt = np.zeros((n, 6), np.float32)
    t = np.linspace(0, 2 * np.pi, n)
    gt[:, 0] = 30 * np.cos(t)
    gt[:, 1] = 30 * np.sin(t)
    gt[:, 5] = np.unwrap(t + np.pi / 2)

    gtT = np.asarray(se3.pose_to_matrix(jnp.asarray(gt)))
    # noisy relative measurements accumulate into drifted odometry
    odoT = [gtT[0]]
    Zs = [np.eye(4, dtype=np.float32)]
    for k in range(1, n):
        Z = np.linalg.inv(gtT[k - 1]) @ gtT[k]
        noise = np.asarray(se3.se3_exp(jnp.asarray(
            np.r_[rng.normal(0, drift_t, 3), rng.normal(0, drift_r, 3)],
            jnp.float32)))
        Zn = Z @ noise
        Zs.append(Zn.astype(np.float32))
        odoT.append(odoT[-1] @ Zn)
    odoT = np.array(odoT, np.float32)
    odo6 = np.asarray(se3.matrix_to_pose(jnp.asarray(odoT)))

    g = pg.empty_graph(SPEC)
    between = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    between[1:n] = np.array(Zs[1:])
    kf_mask = np.zeros(K, bool)
    kf_mask[:n] = True
    g = g._replace(between_T=jnp.asarray(between), kf_mask=jnp.asarray(kf_mask))

    poses = np.zeros((K, 6), np.float32)
    poses[:n] = odo6
    return gt, poses, g, n


def test_odometry_only_is_stable(rng):
    """With only odometry factors the solution must stay at the odometry."""
    gt, poses, g, n = chain_graph(rng, 40)
    out = np.asarray(pg.solve(jnp.asarray(poses), g, SPEC))
    np.testing.assert_allclose(out[:n], poses[:n], atol=1e-2)


def test_loop_closure_reduces_drift(rng):
    gt, poses, g, n = chain_graph(rng, 60, drift_t=0.05)
    gtT = np.asarray(se3.pose_to_matrix(jnp.asarray(gt)))
    # loop factor closing the circuit: (0, n-1) with true relative pose
    Z = np.linalg.inv(gtT[0]) @ gtT[n - 1]
    li = np.zeros(SPEC.max_loops, np.int32)
    lj = np.zeros(SPEC.max_loops, np.int32)
    lT = np.tile(np.eye(4, dtype=np.float32), (SPEC.max_loops, 1, 1))
    linfo = np.zeros(SPEC.max_loops, np.float32)
    lm = np.zeros(SPEC.max_loops, bool)
    li[0], lj[0], lT[0], linfo[0], lm[0] = 0, n - 1, Z, 10.0, True
    g = g._replace(loop_i=jnp.asarray(li), loop_j=jnp.asarray(lj),
                   loop_T=jnp.asarray(lT), loop_info=jnp.asarray(linfo),
                   loop_mask=jnp.asarray(lm))

    drift_before = np.linalg.norm(poses[n - 1, :3] - gt[n - 1, :3])
    out = np.asarray(pg.solve(jnp.asarray(poses), g, SOFT))
    drift_after = np.linalg.norm(out[n - 1, :3] - gt[n - 1, :3])
    assert drift_after < 0.25 * drift_before, (drift_before, drift_after)
    # end pose must now be consistent with the loop measurement
    T0 = np.asarray(se3.pose_to_matrix(jnp.asarray(out[0])))
    Tn = np.asarray(se3.pose_to_matrix(jnp.asarray(out[n - 1])))
    rel = np.linalg.inv(T0) @ Tn
    np.testing.assert_allclose(rel[:3, 3], Z[:3, 3], atol=0.3)


def test_gauge_fixed(rng):
    gt, poses, g, n = chain_graph(rng, 30)
    out = np.asarray(pg.solve(jnp.asarray(poses), g, SPEC))
    np.testing.assert_allclose(out[0], poses[0], atol=1e-4)


def test_robust_kernel_downweights_bad_loop(rng):
    """A wildly wrong loop factor must not destroy the trajectory."""
    gt, poses, g, n = chain_graph(rng, 60, drift_t=0.01)
    li = np.zeros(SPEC.max_loops, np.int32)
    lj = np.zeros(SPEC.max_loops, np.int32)
    lT = np.tile(np.eye(4, dtype=np.float32), (SPEC.max_loops, 1, 1))
    linfo = np.zeros(SPEC.max_loops, np.float32)
    lm = np.zeros(SPEC.max_loops, bool)
    bogus = np.eye(4, dtype=np.float32)
    bogus[:3, 3] = [40.0, -40.0, 5.0]  # absurd measurement
    li[0], lj[0], lT[0], linfo[0], lm[0] = 5, 50, bogus, 10.0, True
    g = g._replace(loop_i=jnp.asarray(li), loop_j=jnp.asarray(lj),
                   loop_T=jnp.asarray(lT), loop_info=jnp.asarray(linfo),
                   loop_mask=jnp.asarray(lm))
    out = np.asarray(pg.solve(jnp.asarray(poses), g, SOFT))
    # trajectory shift must stay bounded (robust kernel saturates the factor)
    shift = np.linalg.norm(out[:n, :3] - poses[:n, :3], axis=1).max()
    assert shift < 2.0, shift


def test_gps_altitude_pulls_z(rng):
    gt, poses, g, n = chain_graph(rng, 40)
    poses = poses.copy()
    poses[:n, 2] += np.linspace(0, 3.0, n)  # fake z drift
    alt = np.zeros(SPEC.max_keyframes, np.float32)
    gm = np.zeros(SPEC.max_keyframes, bool)
    alt[:n] = gt[:n, 2]
    gm[:n] = True
    g = g._replace(gps_alt=jnp.asarray(alt), gps_mask=jnp.asarray(gm))
    out = np.asarray(pg.solve(jnp.asarray(poses), g, SOFT._replace(gps_info_z=1.0)))
    assert np.abs(out[:n, 2] - gt[:n, 2]).mean() < np.abs(
        poses[:n, 2] - gt[:n, 2]).mean() * 0.8
