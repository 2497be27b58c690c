"""Pose-graph optimization: matrix-free Gauss-Newton with preconditioned CG.

TPU-native replacement for the reference's GTSAM iSAM2 backend
(`pgo_node.cpp:80-111, 249-295, 453-473, 498-528`):
- PriorFactor on node 0 → gauge fixing (node 0 held fixed; the reference uses
  a 1e-12-noise prior, numerically the same thing).
- Sequential BetweenFactors from odometry with diagonal information
  (1/1e-6 trans, 1/1e-4 rot — `pgo_node.cpp:91-93`).
- Loop BetweenFactors with Cauchy-robust weights scaled by ICP fitness
  (`pgo_node.cpp:453-473`) — implemented as IRLS reweighting.
- Altitude-only GPSFactor (`pgo_node.cpp:104-111,279-287`).

Instead of incremental sparse factorization (iSAM2), the full graph is
re-solved by Gauss-Newton whose normal equations H δ = −g are solved
matrix-free: H·v = Jᵀ W J v comes from one jvp + one vjp of the stacked
residual function, preconditioned by exact 6×6 block-Jacobi blocks assembled
from per-factor Jacobians. Everything is fixed-shape (padded factor arrays +
masks) and jit-compiled; the keyframe axis shards across devices with `psum`
reductions (see parallel/).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from xchu_slam_tpu.utils import se3

_PREC = jax.lax.Precision.HIGHEST


class GraphSpec(NamedTuple):
    max_keyframes: int = 2048
    max_loops: int = 256
    odom_info_t: float = 1e6     # 1/variance (reference variance 1e-6)
    odom_info_r: float = 1e4     # 1/variance (reference variance 1e-4)
    cauchy_k: float = 1.0
    gn_iterations: int = 8
    cg_iterations: int = 100
    cg_tol: float = 1e-8
    gps_info_xy: float = 1e-9    # reference variance 1e9
    gps_info_z: float = 1.0 / 250.0


def spec_from_config(pgo_cfg) -> GraphSpec:
    return GraphSpec(
        max_keyframes=pgo_cfg.max_keyframes,
        max_loops=pgo_cfg.max_loops,
        odom_info_t=1.0 / pgo_cfg.odom_noise_trans,
        odom_info_r=1.0 / pgo_cfg.odom_noise_rot,
        cauchy_k=pgo_cfg.cauchy_k,
        gn_iterations=pgo_cfg.gn_iterations,
        cg_iterations=pgo_cfg.cg_iterations,
        cg_tol=pgo_cfg.cg_tol,
        gps_info_xy=1.0 / pgo_cfg.gps_noise_xy,
        gps_info_z=1.0 / pgo_cfg.gps_noise_alt,
    )


class GraphData(NamedTuple):
    """Fixed-capacity factor storage (device arrays)."""

    between_T: jnp.ndarray    # [K,4,4]: Z_{k-1,k}; valid for 1 ≤ k < count
    kf_mask: jnp.ndarray      # [K] bool: live keyframes
    loop_i: jnp.ndarray       # [L] int32
    loop_j: jnp.ndarray       # [L] int32
    loop_T: jnp.ndarray       # [L,4,4]: Z_ij (pose of j in i's frame)
    loop_info: jnp.ndarray    # [L]: scalar information (≈ 1/fitness)
    loop_mask: jnp.ndarray    # [L] bool
    gps_alt: jnp.ndarray      # [K]: measured altitude
    gps_mask: jnp.ndarray     # [K] bool


def empty_graph(spec: GraphSpec) -> GraphData:
    K, L = spec.max_keyframes, spec.max_loops
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K, 4, 4))
    eyeL = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (L, 4, 4))
    return GraphData(
        between_T=jnp.array(eye),
        kf_mask=jnp.zeros(K, bool),
        loop_i=jnp.zeros(L, jnp.int32),
        loop_j=jnp.zeros(L, jnp.int32),
        loop_T=jnp.array(eyeL),
        loop_info=jnp.zeros(L, jnp.float32),
        loop_mask=jnp.zeros(L, bool),
        gps_alt=jnp.zeros(K, jnp.float32),
        gps_mask=jnp.zeros(K, bool),
    )


def _between_residual(Ti, Tj, Z):
    """log(Z⁻¹ · Ti⁻¹ · Tj) ∈ R⁶."""
    pred = jnp.matmul(se3.inverse(Ti), Tj, precision=_PREC)
    return se3.se3_log(jnp.matmul(se3.inverse(Z), pred, precision=_PREC))


def _whitened_residuals(xi, Ts0, g: GraphData, spec: GraphSpec):
    """All whitened residuals stacked; xi [K,6] is the tangent update
    (node 0 is gauge-fixed by masking its update to zero)."""
    K = Ts0.shape[0]
    mask0 = jnp.ones((K, 1), xi.dtype).at[0, 0].set(0.0)
    T = jnp.matmul(Ts0, se3.se3_exp(xi * mask0), precision=_PREC)

    # sequential odometry between factors: (k-1) → k
    Ti = T[:-1]
    Tj = T[1:]
    Z = g.between_T[1:]
    r_odom = jax.vmap(_between_residual)(Ti, Tj, Z)           # [K-1,6]
    w_odom = jnp.where(
        (g.kf_mask[:-1] & g.kf_mask[1:])[:, None],
        jnp.sqrt(jnp.array([spec.odom_info_t] * 3 + [spec.odom_info_r] * 3,
                           xi.dtype))[None, :],
        0.0,
    )

    # loop between factors
    Tli = T[g.loop_i]
    Tlj = T[g.loop_j]
    r_loop = jax.vmap(_between_residual)(Tli, Tlj, g.loop_T)  # [L,6]
    w_loop = jnp.where(g.loop_mask[:, None],
                       jnp.sqrt(jnp.maximum(g.loop_info, 0.0))[:, None], 0.0)

    # altitude-only GPS factors
    r_gps = T[:, 2, 3] - g.gps_alt                             # [K]
    w_gps = jnp.where(g.gps_mask & g.kf_mask,
                      jnp.sqrt(jnp.float32(spec.gps_info_z)), 0.0)

    return r_odom * w_odom, r_loop * w_loop, r_gps * w_gps


def _cauchy_weights(r_loop_whitened, k: float):
    """IRLS weights for the Cauchy robust kernel on loop factors
    (reference robustLoopNoise, pgo_node.cpp:96-102)."""
    s = jnp.sum(r_loop_whitened ** 2, axis=-1)
    return 1.0 / (1.0 + s / (k * k))


def _block_jacobi(xi0, Ts0, g, spec, robust_w):
    """Exact 6×6 diagonal blocks of H = Jᵀ W J, assembled per factor."""
    K = Ts0.shape[0]

    def odom_blocks(k):
        def r_i(x):
            Ti = jnp.matmul(Ts0[k - 1], se3.se3_exp(x), precision=_PREC)
            return _between_residual(Ti, Ts0[k], g.between_T[k])

        def r_j(x):
            Tj = jnp.matmul(Ts0[k], se3.se3_exp(x), precision=_PREC)
            return _between_residual(Ts0[k - 1], Tj, g.between_T[k])

        Ji = jax.jacfwd(r_i)(jnp.zeros(6, jnp.float32))
        Jj = jax.jacfwd(r_j)(jnp.zeros(6, jnp.float32))
        return Ji, Jj

    ks = jnp.arange(1, K)
    Ji, Jj = jax.vmap(odom_blocks)(ks)                         # [K-1,6,6]
    w = jnp.where((g.kf_mask[:-1] & g.kf_mask[1:]),
                  1.0, 0.0)[:, None, None]
    Winfo = jnp.diag(jnp.array([spec.odom_info_t] * 3 + [spec.odom_info_r] * 3,
                               jnp.float32))
    Hi = jnp.einsum("fab,bc,fcd->fad", Ji.transpose(0, 2, 1), Winfo, Ji,
                    precision=_PREC) * w
    Hj = jnp.einsum("fab,bc,fcd->fad", Jj.transpose(0, 2, 1), Winfo, Jj,
                    precision=_PREC) * w

    blocks = jnp.zeros((K, 6, 6), jnp.float32)
    blocks = blocks.at[ks - 1].add(Hi)
    blocks = blocks.at[ks].add(Hj)

    def loop_blocks(l):
        i, j = g.loop_i[l], g.loop_j[l]

        def r_i(x):
            Ti = jnp.matmul(Ts0[i], se3.se3_exp(x), precision=_PREC)
            return _between_residual(Ti, Ts0[j], g.loop_T[l])

        def r_j(x):
            Tj = jnp.matmul(Ts0[j], se3.se3_exp(x), precision=_PREC)
            return _between_residual(Ts0[i], Tj, g.loop_T[l])

        Ji = jax.jacfwd(r_i)(jnp.zeros(6, jnp.float32))
        Jj = jax.jacfwd(r_j)(jnp.zeros(6, jnp.float32))
        return Ji, Jj

    L = g.loop_i.shape[0]
    Jli, Jlj = jax.vmap(loop_blocks)(jnp.arange(L))
    wl = (jnp.where(g.loop_mask, g.loop_info, 0.0) * robust_w)[:, None, None]
    Hli = jnp.einsum("fab,fcd->fad", Jli.transpose(0, 2, 1), Jli,
                     precision=_PREC) * wl
    Hlj = jnp.einsum("fab,fcd->fad", Jlj.transpose(0, 2, 1), Jlj,
                     precision=_PREC) * wl
    blocks = blocks.at[g.loop_i].add(jnp.where(g.loop_mask[:, None, None], Hli, 0.0))
    blocks = blocks.at[g.loop_j].add(jnp.where(g.loop_mask[:, None, None], Hlj, 0.0))

    # gps: d(z)/dxi — approximate with translation-z row only
    gz = jnp.where(g.gps_mask & g.kf_mask, spec.gps_info_z, 0.0)
    blocks = blocks.at[:, 2, 2].add(gz)

    # gauge fixing + damping
    blocks = blocks.at[0].set(jnp.eye(6))
    blocks = blocks + 1e-6 * jnp.eye(6)[None]
    return blocks


def sharded_gn_solve(poses6, between_l, pairmask_l, eb, li_l, lj_l, lT_l,
                     linfo_l, lmask_l, gpsa_l, gpsm_l, gb,
                     spec: GraphSpec, axis: str):
    """Factor-sharded Gauss-Newton+CG solve body (poses replicated, factors
    sharded over the mesh axis). Each device evaluates residuals, Jacobian
    products, and preconditioner blocks for ITS slice of between/loop/GPS
    factors; gradients, Hessian-vector products, and block-Jacobi blocks
    combine with deterministic all-gather-sum reductions, so every device
    runs an identical CG loop and holds identical optimized poses
    (SURVEY.md §2d P4/P5, §5 long-context: the keyframe/factor axis is the
    sharding axis of the backend).

    `eb`/`gb` are this device's first between/GPS factor indices (traced
    scalars); between row i maps to edge (k-1, k) with k = clip(eb+i, 1, K-1)
    and a zero `pairmask_l` weight on the clipped duplicate row, so every
    factor is counted exactly once across the mesh. Called by `solve(axis=…)`
    (slicing replicated inputs) and by parallel/sharded.py (physically
    sharded inputs)."""
    K = poses6.shape[0]

    def allred(x):
        return jnp.sum(jax.lax.all_gather(x, axis), 0)

    odom_sqrtw = jnp.sqrt(jnp.array([spec.odom_info_t] * 3 +
                                    [spec.odom_info_r] * 3, jnp.float32))
    Ts0 = se3.pose_to_matrix(poses6)
    E = between_l.shape[0]
    Lh = li_l.shape[0]
    G = gpsa_l.shape[0]

    def residuals(xi, Ts, robust_w):
        mask0 = jnp.ones((K, 1), xi.dtype).at[0, 0].set(0.0)
        T = jnp.matmul(Ts, se3.se3_exp(xi * mask0), precision=_PREC)
        ke = jnp.clip(eb + jnp.arange(E), 1, K - 1)
        r_o = jax.vmap(_between_residual)(T[ke - 1], T[ke], between_l)
        r_o = r_o * jnp.where(pairmask_l[:, None], odom_sqrtw[None, :], 0.0)
        r_l = jax.vmap(_between_residual)(T[li_l], T[lj_l], lT_l)
        w_l = jnp.where(lmask_l, jnp.sqrt(jnp.maximum(linfo_l, 0.0)), 0.0)
        r_l = r_l * (w_l * jnp.sqrt(robust_w))[:, None]
        kg = jnp.clip(gb + jnp.arange(G), 0, K - 1)
        r_g = (T[kg, 2, 3] - gpsa_l) * jnp.where(
            gpsm_l, jnp.sqrt(jnp.float32(spec.gps_info_z)), 0.0)
        return jnp.concatenate([r_o.reshape(-1), r_l.reshape(-1), r_g])

    def gn_iter(Ts, _):
        xi0 = jnp.zeros((K, 6), jnp.float32)
        r_l0 = jax.vmap(_between_residual)(Ts[li_l], Ts[lj_l], lT_l)
        w_l = jnp.where(lmask_l, jnp.sqrt(jnp.maximum(linfo_l, 0.0)), 0.0)
        robust_w = _cauchy_weights(r_l0 * w_l[:, None], spec.cauchy_k)

        resfn = lambda xi: residuals(xi, Ts, robust_w)
        r0, vjp = jax.vjp(resfn, xi0)
        grad = allred(vjp(r0)[0])

        def hvp(v):
            _, jv = jax.jvp(resfn, (xi0,), (v,))
            return allred(vjp(jv)[0])

        # block-Jacobi preconditioner from local factors, reduced
        def eblocks(r):
            k = jnp.clip(eb + r, 1, K - 1)

            def r_i(x):
                Ti = jnp.matmul(Ts[k - 1], se3.se3_exp(x), precision=_PREC)
                return _between_residual(Ti, Ts[k], between_l[r])

            def r_j(x):
                Tj = jnp.matmul(Ts[k], se3.se3_exp(x), precision=_PREC)
                return _between_residual(Ts[k - 1], Tj, between_l[r])

            return (jax.jacfwd(r_i)(jnp.zeros(6, jnp.float32)),
                    jax.jacfwd(r_j)(jnp.zeros(6, jnp.float32)))

        Ji, Jj = jax.vmap(eblocks)(jnp.arange(E))
        Winfo = jnp.diag(odom_sqrtw ** 2)
        wpair = pairmask_l.astype(jnp.float32)[:, None, None]
        Hi = jnp.einsum("fab,bc,fcd->fad", Ji.transpose(0, 2, 1), Winfo, Ji,
                        precision=_PREC) * wpair
        Hj = jnp.einsum("fab,bc,fcd->fad", Jj.transpose(0, 2, 1), Winfo, Jj,
                        precision=_PREC) * wpair
        ke = jnp.clip(eb + jnp.arange(E), 1, K - 1)
        blocks = jnp.zeros((K, 6, 6), jnp.float32)
        blocks = blocks.at[ke - 1].add(Hi)
        blocks = blocks.at[ke].add(Hj)

        def lblocks(r):
            def r_i(x):
                Ti = jnp.matmul(Ts[li_l[r]], se3.se3_exp(x), precision=_PREC)
                return _between_residual(Ti, Ts[lj_l[r]], lT_l[r])

            def r_j(x):
                Tj = jnp.matmul(Ts[lj_l[r]], se3.se3_exp(x), precision=_PREC)
                return _between_residual(Ts[li_l[r]], Tj, lT_l[r])

            return (jax.jacfwd(r_i)(jnp.zeros(6, jnp.float32)),
                    jax.jacfwd(r_j)(jnp.zeros(6, jnp.float32)))

        Jli, Jlj = jax.vmap(lblocks)(jnp.arange(Lh))
        wl = (jnp.where(lmask_l, linfo_l, 0.0) * robust_w)[:, None, None]
        blocks = blocks.at[li_l].add(
            jnp.einsum("fab,fcd->fad", Jli.transpose(0, 2, 1), Jli,
                       precision=_PREC) * wl)
        blocks = blocks.at[lj_l].add(
            jnp.einsum("fab,fcd->fad", Jlj.transpose(0, 2, 1), Jlj,
                       precision=_PREC) * wl)
        blocks = allred(blocks)
        blocks = blocks.at[0].set(jnp.eye(6))
        blocks = blocks + 1e-6 * jnp.eye(6)[None]
        chol = jnp.linalg.cholesky(blocks)

        def precond(v):
            return jax.scipy.linalg.cho_solve((chol, True), v[..., None])[..., 0]

        b = -grad

        def cg_body(st):
            x, r, z, p, rz, it = st
            Hp = hvp(p)
            alpha = rz / jnp.maximum(jnp.vdot(p, Hp), 1e-20)
            x = x + alpha * p
            r = r - alpha * Hp
            z = precond(r)
            rz_new = jnp.vdot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            return x, r, z, z + beta * p, rz_new, it + 1

        def cg_cond(st):
            return (jnp.vdot(st[1], st[1]) > spec.cg_tol) & \
                (st[5] < spec.cg_iterations)

        z0 = precond(b)
        x, *_ = jax.lax.while_loop(
            cg_cond, cg_body,
            (jnp.zeros_like(b), b, z0, z0, jnp.vdot(b, z0), jnp.int32(0)))
        mask0 = jnp.ones((K, 1), jnp.float32).at[0, 0].set(0.0)
        return jnp.matmul(Ts, se3.se3_exp(x * mask0), precision=_PREC), None

    Ts, _ = jax.lax.scan(gn_iter, Ts0, None, length=spec.gn_iterations)
    return se3.matrix_to_pose(Ts)


def _solve_factor_sharded(poses6, graph: GraphData, spec: GraphSpec,
                          axis: str) -> jnp.ndarray:
    """`solve` with factors sharded over the mesh: slice this device's factor
    shard out of the replicated graph arrays, then run the shared
    `sharded_gn_solve` body."""
    K = poses6.shape[0]
    L = graph.loop_i.shape[0]
    D = jax.lax.axis_size(axis)
    if K % D != 0 or L % D != 0:
        raise ValueError(
            f"max_keyframes ({K}) and max_loops ({L}) must be divisible by "
            f"the mesh size ({D})")
    E, Lh = K // D, L // D
    me = jax.lax.axis_index(axis)
    eb, lb = me * E, me * Lh
    sk = lambda a: jax.lax.dynamic_slice_in_dim(a, eb, E)
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, lb, Lh)
    pairmask = jnp.concatenate(
        [jnp.zeros(1, bool), graph.kf_mask[:-1] & graph.kf_mask[1:]])
    out = sharded_gn_solve(
        poses6, sk(graph.between_T), sk(pairmask), eb,
        sl(graph.loop_i), sl(graph.loop_j), sl(graph.loop_T),
        sl(graph.loop_info), sl(graph.loop_mask),
        sk(graph.gps_alt), sk(graph.gps_mask & graph.kf_mask), eb,
        spec, axis)
    return jnp.where(graph.kf_mask[:, None], out, poses6)


@functools.partial(jax.jit, static_argnames=("spec", "axis"))
def solve(poses6: jnp.ndarray, graph: GraphData, spec: GraphSpec,
          axis: str | None = None) -> jnp.ndarray:
    """Optimize all keyframe poses. poses6 [K,6] → optimized [K,6].

    The reference runs isam->update twice then rewrites every pose
    (`ISAM2Update`, pgo_node.cpp:498-528); here each call is a fresh
    Gauss-Newton solve of the full graph. With `axis` set (inside a
    replicated-input `shard_map`), the factor set shards over the mesh —
    see `_solve_factor_sharded` / `sharded_gn_solve`."""
    if axis is not None:
        return _solve_factor_sharded(poses6, graph, spec, axis)
    K = poses6.shape[0]
    Ts = se3.pose_to_matrix(poses6)

    def gn_iter(Ts, _):
        xi0 = jnp.zeros((K, 6), jnp.float32)

        # robust (IRLS) weights from current loop residuals
        _ro, rl, _rg = _whitened_residuals(xi0, Ts, graph, spec)
        robust_w = _cauchy_weights(rl, spec.cauchy_k)

        def resfn(xi):
            ro, rl_, rg = _whitened_residuals(xi, Ts, graph, spec)
            rl_ = rl_ * jnp.sqrt(robust_w)[:, None]
            return jnp.concatenate([ro.reshape(-1), rl_.reshape(-1), rg])

        r0, vjp = jax.vjp(resfn, xi0)
        grad = vjp(r0)[0]                                     # Jᵀ r  [K,6]

        def hvp(v):
            _, jv = jax.jvp(resfn, (xi0,), (v,))
            return vjp(jv)[0]

        blocks = _block_jacobi(xi0, Ts, graph, spec, robust_w)
        # block-Jacobi preconditioner application
        chol = jnp.linalg.cholesky(blocks)

        def precond(v):
            y = jax.scipy.linalg.cho_solve((chol, True), v[..., None])
            return y[..., 0]

        b = -grad

        def cg_body(state):
            x, r, z, p, rz, it = state
            Hp = hvp(p)
            alpha = rz / jnp.maximum(jnp.vdot(p, Hp), 1e-20)
            x = x + alpha * p
            r = r - alpha * Hp
            z = precond(r)
            rz_new = jnp.vdot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            p = z + beta * p
            return x, r, z, p, rz_new, it + 1

        def cg_cond(state):
            _x, r, _z, _p, _rz, it = state
            return (jnp.vdot(r, r) > spec.cg_tol) & (it < spec.cg_iterations)

        z0 = precond(b)
        x0 = jnp.zeros_like(b)
        x, *_ = jax.lax.while_loop(
            cg_cond, cg_body, (x0, b, z0, z0, jnp.vdot(b, z0), jnp.int32(0))
        )
        mask0 = jnp.ones((K, 1), jnp.float32).at[0, 0].set(0.0)
        Ts_new = jnp.matmul(Ts, se3.se3_exp(x * mask0), precision=_PREC)
        return Ts_new, None

    Ts, _ = jax.lax.scan(gn_iter, Ts, None, length=spec.gn_iterations)
    out = se3.matrix_to_pose(Ts)
    # untouched (masked-out) keyframes keep their input poses
    return jnp.where(graph.kf_mask[:, None], out, poses6)
