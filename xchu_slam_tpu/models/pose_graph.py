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
    cg_tol: float = 1e-6         # RELATIVE PCG stop on the PRECONDITIONED
    # norm: exit when rᵀM⁻¹r < tol·bᵀM⁻¹b (cg_cond below) — the effective
    # threshold depends on `precond` (tridiag vs jacobi)
    # NOTE deliberately NO gps_info_xy: the reference's GPSFactor "constrains"
    # xy with variance 1e9 — and feeds it the CURRENT optimized xy estimate
    # (pgo_node.cpp:279-287), so the xy rows are a numerical no-op twice
    # over. Our GPS factor is honestly altitude-only; config.gps_noise_xy
    # remains as parameter-inventory documentation.
    gps_info_z: float = 1.0 / 250.0
    # in-step (per-accepted-loop) solve economy — the iSAM2-incrementality
    # analogue (pgo_node.cpp:498-528). The mid-run graph is warm-started from
    # the previous optimum plus one new factor, so few GN iterations suffice;
    # the finalize solve always runs the full gn_iterations. solve_every=M
    # re-solves only every M-th accepted loop (opt poses stay stale between,
    # exactly what batching iSAM2 updates would do). Measured on TPU v5e at
    # K=2048: full solve ≈ gn·cg·0.33 ms (see PERF.md "pose-graph solve
    # cost"); defaults keep in-step cost ~100 ms worst-case.
    inloop_gn_iterations: int = 2
    solve_every: int = 1
    # CG preconditioner: "tridiag" solves the CHAIN part of the Hessian
    # exactly (block-LDLᵀ + O(log K) associative-scan substitution) so CG
    # only has to resolve the loop couplings — on chain-dominated pose graphs
    # plain block-Jacobi CG propagates corrections one hop per iteration and
    # runs to the cap (measured; PERF.md "pose-graph solve cost").
    # "jacobi" = exact 6×6 diagonal blocks only.
    precond: str = "tridiag"


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
        inloop_gn_iterations=pgo_cfg.inloop_gn_iterations,
        solve_every=pgo_cfg.solve_every,
        precond=pgo_cfg.precond,
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


def inloop_spec(spec: GraphSpec) -> GraphSpec:
    """Spec variant for per-accepted-loop solves: warm-started from the
    previous optimum, so `inloop_gn_iterations` replaces the full
    `gn_iterations` (0 = no reduction). Finalize always uses the full spec."""
    if spec.inloop_gn_iterations and \
            spec.inloop_gn_iterations < spec.gn_iterations:
        return spec._replace(gn_iterations=spec.inloop_gn_iterations)
    return spec


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
    (node 0 is gauge-fixed by masking its update to zero).

    TEST ORACLE: production solves route through `sharded_gn_solve`, whose
    inline block assembly re-implements this whitening; the dense-solve
    oracle tests in tests/test_pose_graph.py differentiate THIS function and
    compare against the solver's output, so drift between the two
    implementations fails those tests. Keep the weighting rules in lockstep
    when changing either."""
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


def block_tridiag_factor(D, U):
    """Block-LDLᵀ (Thomas) factorization of a symmetric block-tridiagonal
    matrix M with diagonal blocks D [K,6,6] and super-diagonal coupling
    U [K,6,6] (U[k] couples nodes k-1 and k; U[0] is ignored).

    The system is first symmetrically Jacobi-scaled (d = √diag D per node):
    pose-graph Hessians mix 1e6-weighted translations with 1e4-weighted
    rotations, and the raw Schur recursion underflows f32 on long stiff
    chains (the anchored chain's effective stiffness decays like 1/k).

    Returns (d [K,6], chols [K,6,6], A [K,6,6]) over the SCALED system:
    S_k = D'_k − U'_kᵀ S_{k-1}⁻¹ U'_k, chols[k] = chol(S_k),
    A[k] = S_{k-1}⁻¹ U'_k (A[0] = 0). The recurrence is inherently sequential
    but each step is one 6×6 cho_solve — a `lax.scan` of tiny fused ops,
    paid once per GN iteration."""
    I6 = jnp.eye(6, dtype=D.dtype)

    d = jnp.sqrt(jnp.abs(jnp.diagonal(D, axis1=-2, axis2=-1)) + 1e-12)
    Dn = D / (d[:, :, None] * d[:, None, :])
    dprev = jnp.concatenate([d[:1], d[:-1]], 0)
    Un = U / (dprev[:, :, None] * d[:, None, :])

    def damp(S):
        # damping must track the block's own scale: the anchored chain's
        # Schur complements decay like 1/k, and a FIXED eps compounds through
        # the recursion into O(1) relative error (measured 12-14% even in
        # f64); relative damping keeps the factorization faithful
        return S + (1e-6 * jnp.trace(S) / 6.0 + 1e-12) * I6

    chol0 = jnp.linalg.cholesky(damp(Dn[0]))

    def step(cholprev, x):
        Dk, Uk = x
        Ak = jax.scipy.linalg.cho_solve((cholprev, True), Uk)
        Sk = Dk - jnp.matmul(Uk.transpose(), Ak, precision=_PREC)
        cholk = jnp.linalg.cholesky(damp(0.5 * (Sk + Sk.transpose())))
        return cholk, (cholk, Ak)

    _, (chols, A) = jax.lax.scan(step, chol0, (Dn[1:], Un[1:]))
    chols = jnp.concatenate([chol0[None], chols], 0)
    A = jnp.concatenate([jnp.zeros((1, 6, 6), D.dtype), A], 0)
    return d, chols, A


def block_tridiag_solve(d, chols, A, r):
    """Solve M z = r given `block_tridiag_factor`'s output, in O(log K) depth
    via two affine `associative_scan`s (the TPU-native substitution):

      forward   y_k = r_k − A_kᵀ y_{k-1}          (affine in y_{k-1})
      backward  z_k = S_k⁻¹ y_k − A_{k+1} z_{k+1}  (affine in z_{k+1})

    Affine maps (M, c) compose associatively: (M₂,c₂)∘(M₁,c₁) =
    (M₂M₁, M₂c₁+c₂); the first element's M is zeroed so the prefix result is
    init-independent. With the Jacobi scaling C=diag(d): M = C M' C, so
    z = C⁻¹ solve'(C⁻¹ r)."""
    K = r.shape[0]
    r = r / d

    def combine(a, b):
        Ma, ca = a
        Mb, cb = b
        return (jnp.matmul(Mb, Ma, precision=_PREC),
                jnp.einsum("...ab,...b->...a", Mb, ca,
                           precision=_PREC) + cb)

    # forward substitution
    Mf = -A.transpose(0, 2, 1)
    Mf = Mf.at[0].set(0.0)
    _, y = jax.lax.associative_scan(combine, (Mf, r), axis=0)

    # backward substitution
    b = jax.scipy.linalg.cho_solve((chols, True), y[..., None])[..., 0]
    Mb = -jnp.concatenate([A[1:], jnp.zeros((1, 6, 6), A.dtype)], 0)
    Mb = Mb.at[K - 1].set(0.0)
    _, z = jax.lax.associative_scan(combine, (Mb, b), axis=0, reverse=True)
    return z / d


def _edge_jacobians(Ts, ki, kj, Z):
    """Per-factor 6×6 Jacobians of `_between_residual` w.r.t. the tangent
    updates of nodes i and j, at xi=0 (vmapped forward-mode)."""
    z6 = jnp.zeros(6, jnp.float32)

    def blk(i, j, Zf):
        def r_i(x):
            Ti = jnp.matmul(Ts[i], se3.se3_exp(x), precision=_PREC)
            return _between_residual(Ti, Ts[j], Zf)

        def r_j(x):
            Tj = jnp.matmul(Ts[j], se3.se3_exp(x), precision=_PREC)
            return _between_residual(Ts[i], Tj, Zf)

        return jax.jacfwd(r_i)(z6), jax.jacfwd(r_j)(z6)

    return jax.vmap(blk)(ki, kj, Z)


def sharded_gn_solve(poses6, between_l, pairmask_l, eb, li_l, lj_l, lT_l,
                     linfo_l, lmask_l, gpsa_l, gpsm_l, gb,
                     spec: GraphSpec, axis: str | None = None):
    """Gauss-Newton + preconditioned-CG pose-graph solve over a factor shard
    (the FULL factor set when axis=None — this is the single implementation
    behind `solve` and the mesh engines).

    Performance design (measured on TPU v5e, K=2048 — PERF.md "pose-graph
    solve cost"): CG iterations dominate, and a Hessian-vector product via
    jvp-of-vjp re-traverses the se3 chain (~3.4 ms/iteration). Instead the
    per-factor 6×6 Jacobian blocks are materialized ONCE per GN iteration
    (vmapped `jacfwd` — the same blocks the block-Jacobi preconditioner
    needs) and gradient/Hvp/preconditioner are all assembled from them as
    batched [E,6,6]×[E,6] contractions: H = JᵀWJ exactly (the jvp/vjp pair
    evaluated at xi=0 computes the identical Gauss-Newton matrix), at ~30×
    less per CG iteration.

    Sharding: `eb`/`gb` are this shard's first between/GPS factor indices
    (traced scalars); between row i maps to edge (k-1, k) with
    k = clip(eb+i, 1, K-1) and a zero `pairmask_l` weight on the clipped
    duplicate row, so every factor is counted exactly once across the mesh.
    Cross-shard reductions (grad, Hvp, preconditioner blocks) combine with a
    deterministic all-gather-sum, so every device runs an identical CG loop
    (SURVEY.md §2d P4/P5)."""
    K = poses6.shape[0]

    if axis is None:
        allred = lambda x: x
    else:
        from xchu_slam_tpu.utils import collectives

        # packed: one allred call = one executed all-gather regardless of how
        # many arrays it carries (utils/collectives.py) — the per-GN-iteration
        # (g, blocks, U) reduction rides a single collective
        allred = lambda x: collectives.shard_allsum(x, axis)

    odom_info = jnp.array([spec.odom_info_t] * 3 + [spec.odom_info_r] * 3,
                          jnp.float32)
    Ts0 = se3.pose_to_matrix(poses6)
    E = between_l.shape[0]
    G = gpsa_l.shape[0]
    ke = jnp.clip(eb + jnp.arange(E), 1, K - 1)
    kg = jnp.clip(gb + jnp.arange(G), 0, K - 1)
    gz = jnp.where(gpsm_l, jnp.float32(spec.gps_info_z), 0.0)       # [G]
    wp = pairmask_l.astype(jnp.float32)                             # [E]
    mask0 = jnp.ones((K, 1), jnp.float32).at[0, 0].set(0.0)

    def gn_iter(Ts, _):
        # residuals and robust (IRLS Cauchy) weights at xi=0
        r_o = jax.vmap(_between_residual)(Ts[ke - 1], Ts[ke], between_l)
        r_l = jax.vmap(_between_residual)(Ts[li_l], Ts[lj_l], lT_l)
        w_lin = jnp.where(lmask_l, jnp.maximum(linfo_l, 0.0), 0.0)  # [Lh]
        robust_w = _cauchy_weights(r_l * jnp.sqrt(w_lin)[:, None],
                                   spec.cauchy_k)
        wl = w_lin * robust_w                                       # [Lh]

        # per-factor Jacobian blocks (shared by grad, Hvp, preconditioner)
        Ji, Jj = _edge_jacobians(Ts, ke - 1, ke, between_l)         # [E,6,6]
        Jli, Jlj = _edge_jacobians(Ts, li_l, lj_l, lT_l)            # [Lh,6,6]
        A = Ts[kg, 2, :3]          # GPS altitude row: dz/dρ = R[2,:] [G,3]
        r_g = Ts[kg, 2, 3] - gpsa_l

        def gps6(x3):              # pad [G,3] translation rows to [G,6]
            return jnp.concatenate([x3, jnp.zeros_like(x3)], -1)

        # gradient g = JᵀW r
        wro = r_o * odom_info[None, :] * wp[:, None]
        wrl = r_l * wl[:, None]
        g = jnp.zeros((K, 6), jnp.float32)
        g = g.at[ke - 1].add(jnp.einsum("fab,fa->fb", Ji, wro,
                                        precision=_PREC))
        g = g.at[ke].add(jnp.einsum("fab,fa->fb", Jj, wro, precision=_PREC))
        g = g.at[li_l].add(jnp.einsum("fab,fa->fb", Jli, wrl,
                                      precision=_PREC))
        g = g.at[lj_l].add(jnp.einsum("fab,fa->fb", Jlj, wrl,
                                      precision=_PREC))
        g = g.at[kg].add(gps6((gz * r_g)[:, None] * A))
        # g stays LOCAL here; it is reduced together with the preconditioner
        # blocks (and U) below in one packed collective

        def hvp(v):
            """H v = JᵀW(Jv), assembled from the factor blocks — exactly the
            Gauss-Newton matrix the jvp/vjp pair at xi=0 computes."""
            v = v * mask0
            jv = (jnp.einsum("fab,fb->fa", Ji, v[ke - 1], precision=_PREC)
                  + jnp.einsum("fab,fb->fa", Jj, v[ke], precision=_PREC))
            wjv = jv * odom_info[None, :] * wp[:, None]
            jvl = (jnp.einsum("fab,fb->fa", Jli, v[li_l], precision=_PREC)
                   + jnp.einsum("fab,fb->fa", Jlj, v[lj_l], precision=_PREC))
            wjvl = jvl * wl[:, None]
            y = jnp.zeros((K, 6), jnp.float32)
            y = y.at[ke - 1].add(jnp.einsum("fab,fa->fb", Ji, wjv,
                                            precision=_PREC))
            y = y.at[ke].add(jnp.einsum("fab,fa->fb", Jj, wjv,
                                        precision=_PREC))
            y = y.at[li_l].add(jnp.einsum("fab,fa->fb", Jli, wjvl,
                                          precision=_PREC))
            y = y.at[lj_l].add(jnp.einsum("fab,fa->fb", Jlj, wjvl,
                                          precision=_PREC))
            s = jnp.einsum("fa,fa->f", A, v[kg, :3], precision=_PREC)
            y = y.at[kg].add(gps6((gz * s)[:, None] * A))
            return allred(y) * mask0

        # exact 6×6 block-Jacobi preconditioner from the same blocks
        Winfo = jnp.diag(odom_info)
        Hi = jnp.einsum("fab,bc,fcd->fad", Ji.transpose(0, 2, 1), Winfo, Ji,
                        precision=_PREC) * wp[:, None, None]
        Hj = jnp.einsum("fab,bc,fcd->fad", Jj.transpose(0, 2, 1), Winfo, Jj,
                        precision=_PREC) * wp[:, None, None]
        blocks = jnp.zeros((K, 6, 6), jnp.float32)
        blocks = blocks.at[ke - 1].add(Hi)
        blocks = blocks.at[ke].add(Hj)
        wl3 = wl[:, None, None]
        blocks = blocks.at[li_l].add(
            jnp.einsum("fab,fcd->fad", Jli.transpose(0, 2, 1), Jli,
                       precision=_PREC) * wl3)
        blocks = blocks.at[lj_l].add(
            jnp.einsum("fab,fcd->fad", Jlj.transpose(0, 2, 1), Jlj,
                       precision=_PREC) * wl3)
        gouter = jnp.einsum("f,fa,fb->fab", gz, A, A, precision=_PREC)
        blocks = blocks.at[kg].add(
            jnp.pad(gouter, ((0, 0), (0, 3), (0, 3))))

        if spec.precond == "tridiag":
            # chain-exact preconditioner: M = H_chain + diag(loop/GPS/damping)
            # — a sum of PSD terms, so the block-LDLᵀ factorization is safe.
            # U[k] = M[k-1,k] = Ji_kᵀ W Jj_k (chain coupling only; loop
            # couplings stay with CG). U[1] is zeroed to keep the
            # gauge-fixed node 0 (blocks[0]=I) isolated, matching the true
            # Hessian's empty row/col 0.
            Uc = jnp.einsum("fab,bc,fcd->fad", Ji.transpose(0, 2, 1), Winfo,
                            Jj, precision=_PREC) * wp[:, None, None]
            U = jnp.zeros((K, 6, 6), jnp.float32)
            U = U.at[ke].add(Uc)
            # ONE packed collective reduces the whole GN iteration's
            # cross-shard state (g, blocks, U) — was 3 all-gathers
            g, blocks, U = allred((g, blocks, U))
            g = g * mask0
            blocks = blocks.at[0].set(jnp.eye(6))
            blocks = blocks + 1e-6 * jnp.eye(6)[None]
            U = U.at[1].set(0.0)
            dsc, chols, Af = block_tridiag_factor(blocks, U)

            def precond(v):
                return block_tridiag_solve(dsc, chols, Af, v)
        else:
            g, blocks = allred((g, blocks))
            g = g * mask0
            blocks = blocks.at[0].set(jnp.eye(6))
            blocks = blocks + 1e-6 * jnp.eye(6)[None]
            chol = jnp.linalg.cholesky(blocks)

            def precond(v):
                return jax.scipy.linalg.cho_solve((chol, True),
                                                  v[..., None])[..., 0]

        # PCG with a relative stopping rule on the preconditioned norm
        # (rᵀz < tol·bᵀz₀): scale-invariant, so converged solves stop paying
        # for the iteration cap (the absolute 1e-8 rule never fired; 2.7 s →
        # the measured ~0.1-0.3 s per in-step solve at K=2048)
        b = -g

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

        z0 = precond(b)
        rz0 = jnp.vdot(b, z0)

        def cg_cond(st):
            return (st[4] > spec.cg_tol * rz0) & (st[5] < spec.cg_iterations)

        x, *_ = jax.lax.while_loop(
            cg_cond, cg_body,
            (jnp.zeros_like(b), b, z0, z0, rz0, jnp.int32(0)))
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
    (warm-started) Gauss-Newton solve of the full graph through
    `sharded_gn_solve` — single-device when axis=None, factor-sharded over
    the mesh inside a replicated-input `shard_map` otherwise."""
    if axis is not None:
        return _solve_factor_sharded(poses6, graph, spec, axis)
    K = poses6.shape[0]
    pairmask = jnp.concatenate(
        [jnp.zeros(1, bool), graph.kf_mask[:-1] & graph.kf_mask[1:]])
    out = sharded_gn_solve(
        poses6, graph.between_T, pairmask, jnp.int32(0),
        graph.loop_i, graph.loop_j, graph.loop_T,
        graph.loop_info, graph.loop_mask,
        graph.gps_alt, graph.gps_mask & graph.kf_mask, jnp.int32(0),
        spec, axis=None)
    # untouched (masked-out) keyframes keep their input poses
    return jnp.where(graph.kf_mask[:, None], out, poses6)
