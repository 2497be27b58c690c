"""NDT scan-to-map alignment — the odometry hot loop.

TPU-native re-design of `pclomp::NormalDistributionsTransform`
(`pclomp/ndt_omp_impl.hpp:75-164` computeTransformation, `:177-283`
computeDerivatives, `:762-916` More-Thuente line search) and
`cpu::NormalDistributionsTransform`:

- The per-point score/∇/Hessian accumulation (OMP-parallel partial sums in the
  reference, `:187-280`) becomes one fused XLA program: transform → DIRECT7
  gather → Gaussian score → `jnp.sum` reduction, with the exact gradient and
  Hessian obtained by `jax.grad` / forward-over-reverse `jax.hessian` of the
  score instead of the hand-packed angular-Jacobian tables (`:288-398`).
- The whole Newton iteration INCLUDING the More-Thuente line search runs
  on-device under `lax.while_loop` — a single jit-compiled `align` call per
  scan, no host round-trips.

The Gaussian mixture constants d1/d2 follow `ndt_omp_impl.hpp:80-87`
(outlier_ratio-derived).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from xchu_slam_tpu.ops import voxel_map as vm
from xchu_slam_tpu.utils import collectives, linalg, se3

# imported late in the file's own functions; kept at module scope so tracing
# never triggers a first import (module-level constants must not be tracers)
from xchu_slam_tpu.ops import ndt_deriv  # noqa: E402  (circular-safe: see below)


class NdtSpec(NamedTuple):
    """Static alignment hyper-parameters (reference odom_node.cpp:56-90)."""

    step_size: float = 0.1
    trans_eps: float = 0.01
    max_iterations: int = 30
    outlier_ratio: float = 0.55
    resolution: float = 2.0
    ls_max_trials: int = 10
    closed_form: bool = True  # fused analytic ∇/H (ndt_deriv) vs autodiff
    neighbor_mode: str = "direct7"  # direct1 | direct7 | direct26 | kdtree
    # (reference NeighborSearchMethod dispatch, ndt_omp_impl.hpp:231-245;
    # see voxel_map._MODE_OFFSETS for the exact semantics of each)
    ls_mode: str = "backtrack"  # line-search algorithm:
    #   "backtrack"   (default) Armijo+curvature backtrack with quadratic
    #                 interpolation — the round-1..4 behavior, accuracy-
    #                 validated end to end;
    #   "mt_exact"    faithful More-Thuente: trialValueSelectionMT /
    #                 updateIntervalMT / psi-phi interval switching
    #                 transliterated from ndt_omp_impl.hpp:646-916 with the
    #                 search loop LIVE, under lax.while_loop (oracle-tested
    #                 against a NumPy transliteration, trial-for-trial);
    #   "ref_clamped" what the reference code actually EXECUTES: its
    #                 `interval_converged = (step_max - step_min) > 0`
    #                 initialization (ndt_omp_impl.hpp:806) is true for any
    #                 sane step_min < step_max, so computeStepLengthMT's
    #                 while-loop is dead code and every Newton iteration
    #                 takes α = clamp(|Δp|, trans_eps/2, step_size) with
    #                 zero line-search trials.
    regather_dist: float = 0.0  # re-gather DIRECT7 neighborhoods after this
    # much effective movement (m; rotation weighted by max range). 0.0 =
    # re-gather every Newton iteration (reference behavior); the gathered
    # neighborhood is still reused across that iteration's line-search trials
    # (3× fewer HBM gathers than naive autodiff). Values >0 freeze
    # neighborhoods across iterations; convergence is only accepted on an
    # iteration that regathered, so a stale gradient can never terminate the
    # solve. Measured on the bench phase1 workload (tools/regather_probe.py,
    # TPU v5e, docs/artifacts/regather_guarded.json): the forced fresh
    # iteration raises mean Newton count 1.89 → 2.41 and regather_dist=0.3
    # is strictly DOMINATED — 78.9 vs 90.7 scans/s and ATE 0.89 vs 0.73 m.
    # Keep 0. (An earlier +3-5 % reading, docs/artifacts/regather.json, was
    # taken while the staleness guard was non-binding — review finding.)


def spec_from_config(ndt_cfg) -> NdtSpec:
    return NdtSpec(
        step_size=ndt_cfg.step_size,
        trans_eps=ndt_cfg.trans_eps,
        max_iterations=ndt_cfg.max_iterations,
        outlier_ratio=ndt_cfg.outlier_ratio,
        resolution=ndt_cfg.resolution,
        ls_max_trials=ndt_cfg.line_search_max_trials,
        closed_form=getattr(ndt_cfg, "use_closed_form", True),
        neighbor_mode=getattr(ndt_cfg, "neighbor_mode", "direct7"),
        ls_mode=getattr(ndt_cfg, "ls_mode", "backtrack"),
        regather_dist=getattr(ndt_cfg, "regather_dist", 0.0),
    )


def gauss_constants(outlier_ratio: float, resolution: float) -> tuple[float, float]:
    """d1, d2 from the outlier-ratio mixture (ndt_omp_impl.hpp:80-87)."""
    c1 = 10.0 * (1.0 - outlier_ratio)
    c2 = outlier_ratio / (resolution ** 3)
    d3 = -math.log(c2)
    d1 = -math.log(c1 + c2) - d3
    d2 = -2.0 * math.log((-math.log(c1 * math.exp(-0.5) + c2) - d3) / d1)
    return d1, d2


class AlignResult(NamedTuple):
    pose: jnp.ndarray          # float32[6]
    iterations: jnp.ndarray    # int32
    converged: jnp.ndarray     # bool
    score: jnp.ndarray         # float32 — final NDT loss (lower = better fit)
    matched_frac: jnp.ndarray  # float32 — fraction of source pts hitting ≥1 voxel
    fitness: jnp.ndarray       # float32 — mean sq dist to matched voxel means
    # score/matched_frac/fitness are DIAGNOSTICS (odom log only; loop
    # acceptance uses the ICP verifier's fitness, not these). On the
    # closed-form path they are computed from the final Newton iteration's
    # state — score is the line-search φ at the accepted pose and the
    # matched/fitness stats reuse the last-gathered DIRECT7 neighborhood —
    # instead of a fresh post-loop evaluation, saving one full HBM gather
    # per align (measured ~2-4 ms/scan, see PERF.md). Staleness bound: with
    # the default regather_dist=0 (and on every CONVERGED exit, which
    # requires a fresh gather) the neighborhood is ≤ step_size = 0.1 m
    # staler than the pose, vs 2 m voxels; a max_iterations exit under
    # regather_dist>0 can be up to ~regather_dist stale.


def ndt_loss(pose, src_xyz, src_mask, grid, gspec: vm.GridSpec,
             d1: float, d2: float, psum_axis: str | None = None,
             mode: str = "direct7"):
    """NDT negative-likelihood loss (lower is better; d1 < 0).

    With `psum_axis` set (inside `shard_map`), each device reduces its local
    point shard and the partial sums are combined with an ICI all-reduce — the
    direct analogue of the reference's per-thread partial sums + serial
    reduction (`ndt_omp_impl.hpp:187-280`, SURVEY.md §2d P1/P5)."""
    pts = se3.rotate_translate(pose, src_xyz)
    mean_w, icov6, vvalid = vm.lookup_neighbors(grid, gspec, pts, mode)
    delta = pts[:, None, :] - mean_w
    q = linalg.sym6_matvec(icov6, delta)
    x = jnp.sum(delta * q, -1)
    use = vvalid & src_mask[:, None]
    e = jnp.exp(-0.5 * d2 * jnp.maximum(x, 0.0))
    local = jnp.sum(jnp.where(use, d1 * e, 0.0))
    if psum_axis is not None:
        # all_gather + same-order sum instead of psum: every device gets
        # bit-identical totals, so data-dependent control flow (Newton
        # convergence, line-search trip counts) cannot diverge across ranks —
        # a plain psum may reduce in per-rank order and deadlock collectives
        # inside `while_loop`.
        parts = jax.lax.all_gather(local, psum_axis)
        local = jnp.sum(parts)
    return local


def _fitness(pose, src_xyz, src_mask, grid, gspec, reduce_=lambda x: x,
             nb=None, mode: str = "direct7"):
    """Diagnostics: matched fraction + mean squared distance to the nearest
    DIRECT7 voxel mean (analogue of `getFitnessScore`). `reduce_` combines
    per-shard partial sums when points are sharded over a mesh. With `nb`,
    a precomputed DIRECT7 neighborhood (gathered ≤ one line-search step from
    `pose`) is reused instead of a fresh HBM gather."""
    pts = se3.rotate_translate(pose, src_xyz)
    if nb is None:
        nb = vm.lookup_neighbors(grid, gspec, pts, mode)
    mean_w, _, vvalid = nb
    d2_ = jnp.sum((pts[:, None, :] - mean_w) ** 2, -1)
    d2_ = jnp.where(vvalid, d2_, jnp.inf)
    dmin = jnp.min(d2_, axis=1)
    matched = src_mask & jnp.isfinite(dmin)
    n_match, sum_d, n_mask = reduce_((
        jnp.sum(matched), jnp.sum(jnp.where(matched, dmin, 0.0)),
        jnp.sum(src_mask)))
    fitness = sum_d / jnp.maximum(n_match, 1)
    frac = n_match / jnp.maximum(n_mask, 1)
    return frac, fitness


def _chol_solve6(A, b):
    """Unrolled branch-free 6×6 Cholesky solve. Returns (x, ok) where `ok`
    is False if any pivot was non-positive (A not PD — x is then garbage).

    XLA lowers `jnp.linalg.eigvalsh`/`solve` on TPU to iterative algorithms
    costing ~1.5 ms each even at 6×6; this unrolled form fuses into the
    surrounding kernel for microseconds."""
    n = 6
    ok = jnp.bool_(True)
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                ok = ok & (s > 1e-10)
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution Lᵀ x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x), ok


def newton_direction(g, H):
    """Jacobi-scaled, Gershgorin-shifted Newton direction — branch-free and
    fully fused (no iterative eig/LU).

    The reference solves the raw 6×6 system with JacobiSVD
    (ndt_omp_impl.hpp:119-121) and lets More-Thuente cope with indefiniteness.
    NDT Hessians mix radians and metres, so their eigenvalues span ~6 orders of
    magnitude; scaling by 1/sqrt(|diag(H)|) equilibrates the units, then a
    Gershgorin lower-bound shift clears any negative curvature so the scaled
    system is PD (diagonally dominant) and the unrolled Cholesky solve yields
    a guaranteed descent direction, reducing to ~pure Newton when H is PD."""
    d = jnp.sqrt(jnp.abs(jnp.diagonal(H)) + 1e-8)
    S = 1.0 / d
    Hs = H * S[:, None] * S[None, :]
    I6 = jnp.eye(6, dtype=H.dtype)
    # tier 1: near-Newton (light damping) — valid whenever H is PD
    x1, ok1 = _chol_solve6(Hs + 1e-3 * I6, S * g)
    # tier 2: Gershgorin-shifted (guaranteed PD by diagonal dominance)
    radii = jnp.sum(jnp.abs(Hs), axis=1) - jnp.abs(jnp.diagonal(Hs))
    lower = jnp.min(jnp.diagonal(Hs) - radii)
    upper = jnp.max(jnp.diagonal(Hs) + radii)
    shift = jnp.maximum(0.0, -lower) * 1.05 + 1e-3 * (jnp.abs(upper) + 1e-3)
    x2, _ok2 = _chol_solve6(Hs + shift * I6, S * g)
    dp = S * jnp.where(ok1, x1, x2)
    dp = -dp
    # belt-and-braces: fall back to scaled steepest descent if numerics betray us
    descent = jnp.dot(dp, g) < 0.0
    return jnp.where(descent, dp, -(S * S) * g)


def _safe_div(num, den):
    """num/den with a sign-preserving floor on |den| (branch-free selects mean
    unused branches must still be NaN-free)."""
    tiny = 1e-30
    den = jnp.where(jnp.abs(den) > tiny,
                    den, jnp.where(den >= 0.0, tiny, -tiny))
    return num / den


def mt_trial_value(a_l, f_l, g_l, a_u, f_u, g_u, a_t, f_t, g_t):
    """Faithful branch-free transliteration of `trialValueSelectionMT`
    (reference ndt_omp_impl.hpp:682-757): the four More-Thuente trial cases
    with the cubic (eq 2.4.52/2.4.56 [Sun, Yuan 2006]), quadratic (2.4.2)
    and secant (2.4.5) interpolating minimizers. sqrt arguments are clamped
    to 0 and divisions floored so the unselected branches are NaN-free."""
    # cubic through (a_l, f_l, g_l) and (a_t, f_t, g_t)
    z1 = 3.0 * _safe_div(f_t - f_l, a_t - a_l) - g_t - g_l
    w1 = jnp.sqrt(jnp.maximum(z1 * z1 - g_t * g_l, 0.0))
    a_c1 = a_l + (a_t - a_l) * _safe_div(w1 - g_l - z1, g_t - g_l + 2.0 * w1)
    # quadratic through (f_l, f_t, g_l)
    a_q = a_l - 0.5 * (a_l - a_t) * _safe_div(
        g_l, g_l - _safe_div(f_l - f_t, a_l - a_t))
    case1 = jnp.where(jnp.abs(a_c1 - a_l) < jnp.abs(a_q - a_l),
                      a_c1, 0.5 * (a_q + a_c1))
    # secant through (g_l, g_t)
    a_s = a_l - _safe_div(a_l - a_t, g_l - g_t) * g_l
    case2 = jnp.where(jnp.abs(a_c1 - a_t) >= jnp.abs(a_s - a_t), a_c1, a_s)
    a_t3 = jnp.where(jnp.abs(a_c1 - a_t) < jnp.abs(a_s - a_t), a_c1, a_s)
    case3 = jnp.where(a_t > a_l,
                      jnp.minimum(a_t + 0.66 * (a_u - a_t), a_t3),
                      jnp.maximum(a_t + 0.66 * (a_u - a_t), a_t3))
    # cubic through (a_u, f_u, g_u) and (a_t, f_t, g_t)
    z4 = 3.0 * _safe_div(f_t - f_u, a_t - a_u) - g_t - g_u
    w4 = jnp.sqrt(jnp.maximum(z4 * z4 - g_t * g_u, 0.0))
    case4 = a_u + (a_t - a_u) * _safe_div(w4 - g_u - z4, g_t - g_u + 2.0 * w4)

    sel1 = f_t > f_l
    sel2 = g_t * g_l < 0.0
    sel3 = jnp.abs(g_t) <= jnp.abs(g_l)
    return jnp.where(sel1, case1,
                     jnp.where(sel2, case2, jnp.where(sel3, case3, case4)))


def mt_update_interval(a_l, f_l, g_l, a_u, f_u, g_u, a_t, f_t, g_t):
    """Faithful transliteration of `updateIntervalMT`
    (reference ndt_omp_impl.hpp:646-677). Returns the updated endpoints and
    the interval-converged flag (the U1/U2/U3 update cases; converged when
    none applies, i.e. g_t·(a_l − a_t) == 0 with f_t ≤ f_l)."""
    u1 = f_t > f_l
    u2 = (~u1) & (g_t * (a_l - a_t) > 0.0)
    u3 = (~u1) & (g_t * (a_l - a_t) < 0.0)
    conv = (~u1) & (~u2) & (~u3)
    n_a_u = jnp.where(u1, a_t, jnp.where(u3, a_l, a_u))
    n_f_u = jnp.where(u1, f_t, jnp.where(u3, f_l, f_u))
    n_g_u = jnp.where(u1, g_t, jnp.where(u3, g_l, g_u))
    move_l = u2 | u3
    n_a_l = jnp.where(move_l, a_t, a_l)
    n_f_l = jnp.where(move_l, f_t, f_l)
    n_g_l = jnp.where(move_l, g_t, g_l)
    return n_a_l, n_f_l, n_g_l, n_a_u, n_f_u, n_g_u, conv


def mt_exact_search(phi_dphi, phi0, dphi0, alpha0, nspec: NdtSpec):
    """Faithful More-Thuente search (`computeStepLengthMT`,
    ndt_omp_impl.hpp:762-916) with the search loop LIVE, under
    `lax.while_loop`. Returns (a_t, phi(a_t), trials).

    Transliteration notes (kept bit-faithful to the reference rather than
    'fixed'):
    - psi(a) = φ(a) − φ(0) − μ·a·φ'(0) and its derivative drive the OPEN
      interval; after the interval closes (psi_t ≤ 0 ∧ dpsi_t ≥ 0) the raw φ
      values take over, converting the stored endpoints with the reference's
      own formulas (`:888-896` — including its `f = f + φ0 − μ·φ'(0)·a`
      conversion, whose sign differs from the algebraic psi→phi inverse;
      upstream PCL carries the same line).
    - The reference initializes `interval_converged = (step_max − step_min)
      > 0` (`:806`), which is TRUE for any sane configuration, so ITS loop
      never executes (ls_mode="ref_clamped" reproduces that executed
      behavior). This function is the algorithm as written/intended, loop
      live — max trials, trial selection, clamping and Wolfe exit all per
      the reference text."""
    mu = jnp.float32(1e-4)
    nu = jnp.float32(0.9)
    step_min = jnp.float32(0.5 * nspec.trans_eps)   # caller passes eps/2
    step_max = jnp.float32(nspec.step_size)
    a_t0 = jnp.clip(alpha0, step_min, step_max)
    phi_t0, dphi_t0 = phi_dphi(a_t0)
    g0 = (1.0 - mu) * dphi0               # dpsi at a=0
    zero = jnp.float32(0.0)

    def wolfe(a_t, phi_t, dphi_t):
        psi_t = phi_t - phi0 - mu * a_t * dphi0
        return (psi_t <= 0.0) & (dphi_t <= -nu * dphi0)

    def cond(st):
        a_l, f_l, g_l, a_u, f_u, g_u, a_t, phi_t, dphi_t, open_, done, t = st
        return (~done) & (t < nspec.ls_max_trials) & \
            (~wolfe(a_t, phi_t, dphi_t))

    def body(st):
        a_l, f_l, g_l, a_u, f_u, g_u, a_t, phi_t, dphi_t, open_, done, t = st
        psi_t = phi_t - phi0 - mu * a_t * dphi0
        dpsi_t = dphi_t - mu * dphi0
        f_t = jnp.where(open_, psi_t, phi_t)
        g_t = jnp.where(open_, dpsi_t, dphi_t)
        a_new = jnp.clip(
            mt_trial_value(a_l, f_l, g_l, a_u, f_u, g_u, a_t, f_t, g_t),
            step_min, step_max)
        phi_n, dphi_n = phi_dphi(a_new)
        psi_n = phi_n - phi0 - mu * a_new * dphi0
        dpsi_n = dphi_n - mu * dphi0
        close = open_ & (psi_n <= 0.0) & (dpsi_n >= 0.0)
        # endpoint psi→phi conversion on interval close (reference :888-896)
        f_l = jnp.where(close, f_l + phi0 - mu * dphi0 * a_l, f_l)
        g_l = jnp.where(close, g_l + mu * dphi0, g_l)
        f_u = jnp.where(close, f_u + phi0 - mu * dphi0 * a_u, f_u)
        g_u = jnp.where(close, g_u + mu * dphi0, g_u)
        open_new = open_ & (~close)
        ft_up = jnp.where(open_new, psi_n, phi_n)
        gt_up = jnp.where(open_new, dpsi_n, dphi_n)
        a_l, f_l, g_l, a_u, f_u, g_u, conv = mt_update_interval(
            a_l, f_l, g_l, a_u, f_u, g_u, a_new, ft_up, gt_up)
        return (a_l, f_l, g_l, a_u, f_u, g_u, a_new, phi_n, dphi_n,
                open_new, conv, t + 1)

    st = jax.lax.while_loop(
        cond, body,
        (zero, zero, g0, zero, zero, g0, a_t0, phi_t0, dphi_t0,
         jnp.bool_(True), jnp.bool_(False), jnp.int32(0)))
    return st[6], st[7], st[11]


def newton_align(loss, init_pose, nspec: NdtSpec, bcast=lambda x: x,
                 vgh=None, vg=None, prepare=None):
    """Newton + More-Thuente-style line search, fully on-device, parameterized
    by an arbitrary loss callable (single-device or psum-reduced SPMD).

    `bcast` (a pytree → pytree callable; applied once per iteration to the
    packed (g, H) pair) forces control-flow inputs to be bit-identical across
    SPMD ranks (reverse-mode transposes of collectives can carry per-rank
    float skew, and skew in `while_loop` trip counts deadlocks in-loop
    collectives).

    Mirrors `computeTransformation` (ndt_omp_impl.hpp:75-164): per iteration
    compute ∇/H, solve the 6×6 system, line-search the step length in
    (0, step_size], stop when the accepted step norm < trans_eps or
    max_iterations is hit.

    With `vgh`/`vg` provided (closed-form fused derivatives, ops.ndt_deriv),
    each Newton iteration is ~3 data passes instead of ~13 autodiff passes.

    Returns (pose, iterations, converged, ctx_final, phi_final): ctx_final is
    the last `prepare` context (the DIRECT7 neighborhood on the closed-form
    path) and phi_final the loss at the accepted pose, both carried out of
    the loop so callers can derive diagnostics without re-evaluating."""
    # trace-time guard (nspec is static): phi_fin's initial value is inf, so
    # a zero-iteration loop would return inf score to ANY caller — checked
    # here so direct newton_align callers (gicp.align, parallel/sharded.py)
    # are covered, not just ops.ndt.align (round-4 advice)
    if nspec.max_iterations < 1:
        raise ValueError("NdtSpec.max_iterations must be >= 1")
    if vgh is None:
        _vg = jax.value_and_grad(loss)
        _hess = jax.hessian(loss)
        vgh = lambda p, ctx: (*_vg(p), _hess(p))
    if prepare is None:
        prepare = lambda p: jnp.zeros((), jnp.float32)  # dummy ctx

    mu = 1e-4   # sufficient-decrease (Armijo) constant, as in MT (:771)
    nu = 0.9    # curvature constant

    def line_search(pose, direction, phi0, dphi0, alpha0, ctx):
        if vg is None:
            # forward-mode directional derivative: deterministic across SPMD
            # ranks (reverse-mode collective transposes can skew per rank)
            def phi_dphi(a):
                f = lambda aa: loss(pose + aa * direction)
                return jax.jvp(f, (a,), (jnp.ones_like(a),))
        else:
            def phi_dphi(a):
                phi_a, g_a = vg(pose + a * direction, ctx)
                return phi_a, jnp.dot(g_a, direction)

        if nspec.ls_mode == "mt_exact":
            a_mt, phi_mt, _trials = mt_exact_search(
                phi_dphi, phi0, dphi0, alpha0, nspec)
            return a_mt, phi_mt
        if nspec.ls_mode == "ref_clamped":
            # the reference's EXECUTED behavior (dead MT loop, see NdtSpec):
            # α = clamp(|Δp|, trans_eps/2, step_size); the φ evaluation here
            # is diagnostics-only (the reference likewise evaluates the
            # derivatives at the stepped pose for its next iteration)
            a = jnp.clip(alpha0, 0.5 * nspec.trans_eps, nspec.step_size)
            phi_a, _ = phi_dphi(a)
            return a, phi_a
        if nspec.ls_mode != "backtrack":
            raise ValueError(f"unknown ls_mode {nspec.ls_mode!r}")

        def cond(state):
            a, t, done, best_a, best_phi, phi_acc = state
            return (~done) & (t < nspec.ls_max_trials)

        def body(state):
            a, t, done, best_a, best_phi, phi_acc = state
            phi_a, dphi_a = phi_dphi(a)
            suff = phi_a <= phi0 + mu * a * dphi0
            curv = jnp.abs(dphi_a) <= nu * jnp.abs(dphi0)
            accept = suff & curv
            better = phi_a < best_phi
            best_a = jnp.where(better, a, best_a)
            best_phi = jnp.where(better, phi_a, best_phi)
            # quadratic interpolation backtrack, guarded to [0.1a, 0.5a]
            denom = 2.0 * (phi_a - phi0 - dphi0 * a)
            a_q = jnp.where(jnp.abs(denom) > 1e-12,
                            -dphi0 * a * a / jnp.where(jnp.abs(denom) > 1e-12,
                                                       denom, 1.0),
                            0.5 * a)
            a_next = jnp.clip(a_q, 0.1 * a, 0.5 * a)
            # if sufficient decrease holds but curvature fails with dphi<0,
            # the step is too short — expand toward alpha0 instead
            expand = suff & (~curv) & (dphi_a < 0.0)
            a_next = jnp.where(expand, jnp.minimum(2.0 * a, alpha0), a_next)
            # no progress possible (e.g. expand capped at a == alpha0): stop
            # instead of re-evaluating the identical trial point — the result
            # (best_a) is unchanged, the redundant ∇-passes are not
            stuck = jnp.abs(a_next - a) < 1e-12 * jnp.maximum(a, 1e-12)
            # φ at the trial the loop ends on: the accepted trial, or (on a
            # stuck exit) the stalled trial a_next ≈ a whose φ ≈ phi_a
            phi_acc = jnp.where(accept | stuck, phi_a, phi_acc)
            return (jnp.where(accept, a, a_next), t + 1,
                    done | accept | stuck, best_a, best_phi, phi_acc)

        a_fin, _, accepted, best_a, best_phi, phi_acc = jax.lax.while_loop(
            cond, body, (alpha0, jnp.int32(0), jnp.bool_(False),
                         jnp.float32(0.0), jnp.float32(jnp.inf),
                         jnp.float32(jnp.inf)),
        )
        # `accepted` = the done flag fired: accept predicate OR a stuck exit.
        # On accept, phi_acc is φ at the accepted trial (`a_fin`); on a stuck
        # exit a_fin is a_next with |a_next − a| below the stuck tolerance,
        # so phi_acc (φ at the stalled trial `a`) approximates φ(a_fin) to
        # that same tolerance.
        a_out = jnp.where(accepted, a_fin, best_a)
        phi_out = jnp.where(accepted, phi_acc, best_phi)
        # if nothing improved over phi0, take no step (φ stays at phi0)
        improved = best_phi < phi0
        take = accepted | improved
        return (jnp.where(take, a_out, 0.0),
                jnp.where(take, phi_out, phi0))

    def _moved(a, b):
        d = a - b
        return jnp.linalg.norm(d[:3]) + 60.0 * jnp.linalg.norm(d[3:])

    def newton_body(state):
        pose, it, _converged, _, ctx, ctx_pose, _phi = state
        moved0 = _moved(pose, ctx_pose)
        regather = moved0 > nspec.regather_dist
        ctx = jax.lax.cond(regather, lambda _: prepare(pose), lambda c: c, ctx)
        ctx_pose = jnp.where(regather, pose, ctx_pose)
        phi0, g, H = vgh(pose, ctx)
        g, H = bcast((g, H))
        dp = newton_direction(g, H)
        dpn = jnp.linalg.norm(dp) + 1e-12
        direction = dp / dpn
        dphi0 = jnp.dot(g, direction)
        alpha0 = jnp.minimum(dpn, nspec.step_size)
        alpha, phi_fin = line_search(pose, direction, phi0, dphi0, alpha0, ctx)
        new_pose = pose + alpha * direction
        conv_raw = alpha < nspec.trans_eps
        # convergence may only be DECLARED on an iteration whose gradient was
        # computed at a freshly gathered neighborhood: `fresh` means this
        # iteration regathered at `pose`, or the pose never moved since the
        # gather (moved0 ≈ 0 — e.g. the first iteration on ctx0). With
        # regather_dist=0 that is every moving iteration (reference
        # behavior); with frozen neighborhoods (regather_dist>0) a
        # would-be convergence on a stale gradient instead forces one
        # fresh-gather iteration (the ctx_pose push below fires the regather
        # predicate next round) before the solve may terminate. (Round-4
        # review: an earlier distance-threshold form of this guard was
        # non-binding for every regather_dist < 61·trans_eps·~0.85 — the
        # predicate must be "gathered this iteration", not "gathered
        # nearby".)
        fresh = regather | (moved0 <= 1e-9)
        converged = conv_raw & fresh
        ctx_pose = jnp.where(conv_raw & ~fresh,
                             ctx_pose + jnp.float32(1e6), ctx_pose)
        return new_pose, it + 1, converged, alpha, ctx, ctx_pose, phi_fin

    def newton_cond(state):
        return (~state[2]) & (state[1] < nspec.max_iterations)

    init_pose = jnp.asarray(init_pose, jnp.float32)
    ctx0 = prepare(init_pose)
    pose, iters, converged, _, ctx_fin, _, phi_fin = jax.lax.while_loop(
        newton_cond,
        newton_body,
        (init_pose, jnp.int32(0), jnp.bool_(False), jnp.float32(jnp.inf),
         ctx0, jnp.array(init_pose), jnp.float32(jnp.inf)),
    )
    return pose, iters, converged, ctx_fin, phi_fin


# deterministic cross-device sum, PACKED: one reduce call = one executed
# all-gather regardless of leaf count — a Newton iteration's (L, g, H) rides
# one 43-float collective (utils/collectives.py; VERDICT r4 item 2)
shard_allsum = collectives.shard_allsum


def _local_shard(arrs, axis: str):
    """Slice each array's leading axis to this device's equal shard.

    Used inside `shard_map` bodies whose inputs arrive REPLICATED (in_specs
    P()): storage is replicated, compute is sharded — each device processes
    rows [me·N/D, (me+1)·N/D) and partial results are combined with
    `shard_allsum`. The TPU analogue of the reference's OMP parallel-for with
    per-thread partial sums (`ndt_omp_impl.hpp:187-280`, SURVEY.md §2d P1)."""
    D = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    out = []
    for a in arrs:
        n = a.shape[0]
        if n % D != 0:
            raise ValueError(
                f"leading axis {n} not divisible by mesh size {D}")
        out.append(jax.lax.dynamic_slice_in_dim(a, me * (n // D), n // D))
    return out


@functools.partial(jax.jit, static_argnames=("gspec", "nspec", "axis"))
def align(grid, src_xyz, src_mask, init_pose, gspec: vm.GridSpec,
          nspec: NdtSpec, axis: str | None = None) -> AlignResult:
    """NDT alignment (see `newton_align`).

    With `axis` set (inside a `shard_map` whose inputs are replicated), the
    source POINTS are sharded over the mesh: each device evaluates score/∇/H
    on its shard and the 6-vector/6×6 partials are combined with a
    deterministic all-gather-sum — SURVEY.md §2d P1/P5 as ICI collectives.
    The Newton/line-search control flow runs identically on every device."""
    d1, d2 = gauss_constants(nspec.outlier_ratio, nspec.resolution)
    if axis is not None:
        xyz_l, mask_l = _local_shard((src_xyz, src_mask), axis)
        reduce_ = lambda x: shard_allsum(x, axis)
    else:
        xyz_l, mask_l = src_xyz, src_mask
        reduce_ = lambda x: x

    def loss(p):
        return ndt_loss(p, xyz_l, mask_l, grid, gspec, d1, d2,
                        psum_axis=axis, mode=nspec.neighbor_mode)

    if nspec.closed_form:
        def prepare(p):
            return ndt_deriv.neighborhood(p, xyz_l, grid, gspec,
                                          mode=nspec.neighbor_mode)

        def vgh(p, nb):
            L, g, H = ndt_deriv.ndt_value_grad_hess(
                p, xyz_l, mask_l, grid, gspec, d1, d2, nb=nb)
            return reduce_((L, g, H))

        def vg(p, nb):
            L, g, _ = ndt_deriv.ndt_value_grad_hess(
                p, xyz_l, mask_l, grid, gspec, d1, d2, want_hess=False,
                nb=nb)
            L, g = reduce_((L, g))
            return L, g

        pose, iters, converged, ctx_fin, phi_fin = newton_align(
            loss, init_pose, nspec, vgh=vgh, vg=vg, prepare=prepare)
        nb_fin = ctx_fin
    else:
        # sharded autodiff fallback: reverse-mode transposes of the in-loss
        # collective can carry per-rank float skew, so g/H must be broadcast
        # from rank 0 exactly like the closed-form path's reductions — a
        # divergent Newton/line-search trip count deadlocks the in-loop
        # all_gathers (see newton_align's docstring)
        bcast = (lambda x: collectives.shard_bcast0(x, axis)) \
            if axis is not None else (lambda x: x)
        pose, iters, converged, _ctx, phi_fin = newton_align(
            loss, init_pose, nspec, bcast=bcast)
        nb_fin = None       # autodiff path carries no neighborhood ctx
    # Diagnostics without a fresh post-loop evaluation (see AlignResult):
    # score is the final line-search φ (the loss at the accepted pose, on the
    # last-gathered neighborhood); fitness/matched reuse that neighborhood on
    # the closed-form path. newton_align guarantees ≥1 iteration (φ defined).
    score = phi_fin
    frac, fitness = _fitness(pose, xyz_l, mask_l, grid, gspec, reduce_,
                             nb=nb_fin, mode=nspec.neighbor_mode)
    return AlignResult(pose=pose, iterations=iters, converged=converged,
                       score=score, matched_frac=frac, fitness=fitness)
