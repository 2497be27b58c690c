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
    # trajectory shift must stay bounded RELATIVE to the unrobust solve (the
    # Cauchy kernel saturates the factor's influence; it does not zero it).
    # NOTE: the original absolute bound (2 m) was an artifact of
    # under-converged CG — with the chain-exact preconditioner (or jacobi at
    # cg_iterations=4000) the TRUE robust optimum of this soft chain vs a
    # 57 m bogus measurement sits at ~9 m max shift, vs ~97 m unrobust.
    shift = np.linalg.norm(out[:n, :3] - poses[:n, :3], axis=1).max()
    out_nr = np.asarray(pg.solve(jnp.asarray(poses), g,
                                 SOFT._replace(cauchy_k=1e9)))
    shift_nr = np.linalg.norm(out_nr[:n, :3] - poses[:n, :3], axis=1).max()
    assert shift_nr > 50.0, shift_nr  # the bogus factor really is destructive
    assert shift < 0.15 * shift_nr, (shift, shift_nr)


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


def test_relative_cg_tol_matches_full_iteration_solve():
    """The relative CG exit (||r||² < tol·||b||²) must reach the same optimum
    as grinding out the full iteration cap — it exists to stop PAYING for
    iterations after convergence (measured 2.7 s → ~0.1 s per in-step solve
    at K=2048 on TPU v5e; PERF.md 'pose-graph solve cost')."""
    spec = pg.GraphSpec(max_keyframes=64, max_loops=8,
                        odom_info_t=100.0, odom_info_r=100.0,
                        gn_iterations=4, cg_iterations=80)
    K = 64
    graph = pg.empty_graph(spec)
    poses = np.zeros((K, 6), np.float32)
    poses[:, 0] = np.arange(K) * 1.05
    between = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    between[:, 0, 3] = 1.0
    li = np.zeros(8, np.int32)
    lj = np.zeros(8, np.int32)
    lT = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    lT[0, 0, 3] = float(K - 1)
    linfo = np.zeros(8, np.float32)
    lmask = np.zeros(8, bool)
    lj[0], linfo[0], lmask[0] = K - 1, 10.0, True
    graph = graph._replace(
        between_T=jnp.asarray(between), kf_mask=jnp.ones(K, bool),
        loop_i=jnp.asarray(li), loop_j=jnp.asarray(lj),
        loop_T=jnp.asarray(lT), loop_info=jnp.asarray(linfo),
        loop_mask=jnp.asarray(lmask))

    full = np.asarray(pg.solve(jnp.asarray(poses), graph,
                               spec._replace(cg_tol=0.0)))
    early = np.asarray(pg.solve(jnp.asarray(poses), graph,
                                spec._replace(cg_tol=1e-6)))
    np.testing.assert_allclose(early, full, atol=2e-3)
    assert abs(early[K - 1, 0] - (K - 1)) < 0.5  # drift actually corrected


def test_inloop_spec_reduces_iterations_only_when_configured():
    spec = pg.GraphSpec(gn_iterations=8, inloop_gn_iterations=2)
    assert pg.inloop_spec(spec).gn_iterations == 2
    spec0 = pg.GraphSpec(gn_iterations=8, inloop_gn_iterations=0)
    assert pg.inloop_spec(spec0).gn_iterations == 8


def test_block_hvp_matches_autodiff_gauss_newton():
    """The block-assembled gradient/Hvp inside sharded_gn_solve must equal
    Jᵀ W r and Jᵀ W J v of the whitened residual stack (what the old
    jvp-of-vjp computed) — same math, ~30× cheaper per CG iteration."""
    import jax

    rng = np.random.default_rng(7)
    K, L = 12, 4
    spec = pg.GraphSpec(max_keyframes=K, max_loops=L,
                        odom_info_t=50.0, odom_info_r=20.0,
                        gps_info_z=2.0, cauchy_k=1.0)
    graph = pg.empty_graph(spec)
    poses = rng.normal(0, 0.5, (K, 6)).astype(np.float32)
    bt = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    bt[:, :3, 3] = rng.normal(0, 1, (K, 3))
    li = np.array([0, 2, 0, 0], np.int32)
    lj = np.array([7, 9, 0, 0], np.int32)
    lT = np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
    lT[:2, :3, 3] = rng.normal(0, 1, (2, 3))
    graph = graph._replace(
        between_T=jnp.asarray(bt), kf_mask=jnp.ones(K, bool),
        loop_i=jnp.asarray(li), loop_j=jnp.asarray(lj),
        loop_T=jnp.asarray(lT),
        loop_info=jnp.asarray(np.array([3.0, 1.5, 0, 0], np.float32)),
        loop_mask=jnp.asarray(np.array([1, 1, 0, 0], bool)),
        gps_alt=jnp.asarray(rng.normal(0, 1, K).astype(np.float32)),
        gps_mask=jnp.asarray(rng.random(K) < 0.5))

    Ts = se3.pose_to_matrix(jnp.asarray(poses))
    xi0 = jnp.zeros((K, 6), jnp.float32)

    # reference: autodiff through the whitened residual stack, with the same
    # robust weights sharded_gn_solve derives at xi=0
    _ro, rl0, _rg = pg._whitened_residuals(xi0, Ts, graph, spec)
    robust = pg._cauchy_weights(rl0, spec.cauchy_k)

    def resfn(xi):
        ro, rl, rg = pg._whitened_residuals(xi, Ts, graph, spec)
        rl = rl * jnp.sqrt(robust)[:, None]
        return jnp.concatenate([ro.reshape(-1), rl.reshape(-1), rg])

    r0, vjp = jax.vjp(resfn, xi0)
    grad_ref = np.asarray(vjp(r0)[0])
    v = jnp.asarray(rng.normal(0, 1, (K, 6)).astype(np.float32))
    v = v.at[0].set(0.0)
    _, jv = jax.jvp(resfn, (xi0,), (v,))
    hv_ref = np.asarray(vjp(jv)[0])

    # the block implementation, via a 1-GN-iteration probe: run solve with a
    # single CG iteration and cg_tol=inf disabled ... instead call the
    # internals directly by reconstructing the same quantities
    pairmask = jnp.concatenate(
        [jnp.zeros(1, bool), graph.kf_mask[:-1] & graph.kf_mask[1:]])
    ke = jnp.clip(jnp.arange(K), 1, K - 1)
    r_o = jax.vmap(pg._between_residual)(Ts[ke - 1], Ts[ke],
                                         graph.between_T)
    Ji, Jj = pg._edge_jacobians(Ts, ke - 1, ke, graph.between_T)
    Jli, Jlj = pg._edge_jacobians(Ts, graph.loop_i, graph.loop_j,
                                  graph.loop_T)
    odom_info = jnp.array([spec.odom_info_t] * 3 + [spec.odom_info_r] * 3,
                          jnp.float32)
    wp = pairmask.astype(jnp.float32)
    r_l = jax.vmap(pg._between_residual)(Ts[graph.loop_i], Ts[graph.loop_j],
                                         graph.loop_T)
    wl = jnp.where(graph.loop_mask,
                   jnp.maximum(graph.loop_info, 0.0), 0.0) * robust
    gm = graph.gps_mask & graph.kf_mask
    gz = jnp.where(gm, jnp.float32(spec.gps_info_z), 0.0)
    A = Ts[:, 2, :3]
    r_g = Ts[:, 2, 3] - graph.gps_alt
    mask0 = jnp.ones((K, 1), jnp.float32).at[0, 0].set(0.0)

    def gps6(x3):
        return jnp.concatenate([x3, jnp.zeros_like(x3)], -1)

    g = jnp.zeros((K, 6))
    g = g.at[ke - 1].add(jnp.einsum("fab,fa->fb", Ji,
                                    r_o * odom_info * wp[:, None]))
    g = g.at[ke].add(jnp.einsum("fab,fa->fb", Jj,
                                r_o * odom_info * wp[:, None]))
    g = g.at[graph.loop_i].add(jnp.einsum("fab,fa->fb", Jli,
                                          r_l * wl[:, None]))
    g = g.at[graph.loop_j].add(jnp.einsum("fab,fa->fb", Jlj,
                                          r_l * wl[:, None]))
    g = (g.at[jnp.arange(K)].add(gps6((gz * r_g)[:, None] * A))) * mask0
    np.testing.assert_allclose(np.asarray(g), grad_ref, atol=2e-3)

    jv_o = (jnp.einsum("fab,fb->fa", Ji, v[ke - 1])
            + jnp.einsum("fab,fb->fa", Jj, v[ke]))
    wjv = jv_o * odom_info * wp[:, None]
    jvl = (jnp.einsum("fab,fb->fa", Jli, v[graph.loop_i])
           + jnp.einsum("fab,fb->fa", Jlj, v[graph.loop_j]))
    y = jnp.zeros((K, 6))
    y = y.at[ke - 1].add(jnp.einsum("fab,fa->fb", Ji, wjv))
    y = y.at[ke].add(jnp.einsum("fab,fa->fb", Jj, wjv))
    y = y.at[graph.loop_i].add(jnp.einsum("fab,fa->fb", Jli,
                                          jvl * wl[:, None]))
    y = y.at[graph.loop_j].add(jnp.einsum("fab,fa->fb", Jlj,
                                          jvl * wl[:, None]))
    s = jnp.einsum("fa,fa->f", A, v[:, :3])
    y = (y.at[jnp.arange(K)].add(gps6((gz * s)[:, None] * A))) * mask0
    np.testing.assert_allclose(np.asarray(y), hv_ref, atol=2e-3)


def test_block_tridiag_solve_matches_dense():
    """block_tridiag_factor/solve (lax.scan LDLᵀ + O(log K) associative-scan
    substitutions) vs a dense numpy solve on a random SPD block-tridiagonal
    system, including a stiff chain (1e6/1e4 mixed weights like the odometry
    information matrix)."""
    rng = np.random.default_rng(0)
    for K, stiff in [(9, False), (64, True)]:
        J = rng.normal(0, 1, (K, 6, 6)).astype(np.float32)
        w = np.ones(6, np.float32)
        if stiff:
            w = np.array([1e3] * 3 + [10.0] * 3, np.float32)
        D = np.einsum("kba,b,kbc->kac", J, w, J) + \
            3.0 * np.eye(6, dtype=np.float32)
        U = 0.3 * rng.normal(0, 1, (K, 6, 6)).astype(np.float32)
        U[0] = 0.0
        # symmetric block-tridiagonal M; make it PD by diagonal dominance
        M = np.zeros((K * 6, K * 6), np.float32)
        for k in range(K):
            M[6*k:6*k+6, 6*k:6*k+6] = D[k]
            if k >= 1:
                M[6*(k-1):6*k, 6*k:6*k+6] = U[k]
                M[6*k:6*k+6, 6*(k-1):6*k] = U[k].T
        ew = np.linalg.eigvalsh(M.astype(np.float64))
        if ew.min() < 1e-3:   # ensure PD for the oracle
            D = D + (1e-3 - ew.min()) * np.eye(6, dtype=np.float32)[None]
            for k in range(K):
                M[6*k:6*k+6, 6*k:6*k+6] = D[k]
        r = rng.normal(0, 1, (K, 6)).astype(np.float32)

        d, chols, A = pg.block_tridiag_factor(jnp.asarray(D),
                                              jnp.asarray(U))
        z = np.asarray(pg.block_tridiag_solve(d, chols, A, jnp.asarray(r)))
        z_ref = np.linalg.solve(M.astype(np.float64),
                                r.reshape(-1).astype(np.float64)).reshape(K, 6)
        denom = max(1.0, np.abs(z_ref).max())
        assert np.abs(z - z_ref).max() / denom < 5e-3, \
            (K, stiff, np.abs(z - z_ref).max())
