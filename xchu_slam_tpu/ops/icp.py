"""Point-to-point ICP for loop verification.

TPU-native replacement for the `pcl::IterativeClosestPoint` submap-to-submap
verification (reference `pgo_node.cpp:404-483`: maxCorr 150 m, 100 iterations,
eps 1e-6, accept fitness ≤ 0.3).

Nearest-neighbor correspondence is brute-force chunked pairwise distance on
the MXU (no kd-tree — at submap sizes the systolic array wins), the transform
update is a closed-form weighted Procrustes (Umeyama) step, and the whole
iteration runs under `lax.while_loop` in one compiled program.

Fitness matches PCL's: mean squared distance of source points to their nearest
target point (over correspondences within `max_corr_dist`).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from xchu_slam_tpu.ops.pallas import nn_kernel
from xchu_slam_tpu.utils import se3

_PREC = jax.lax.Precision.HIGHEST


class IcpSpec(NamedTuple):
    max_corr_dist: float = 150.0
    max_iterations: int = 100
    trans_eps: float = 1e-6
    chunk: int = 1024


def spec_from_config(loop_cfg) -> IcpSpec:
    return IcpSpec(
        max_corr_dist=loop_cfg.icp_max_corr_dist,
        max_iterations=loop_cfg.icp_max_iterations,
        trans_eps=loop_cfg.icp_trans_eps,
    )


class IcpResult(NamedTuple):
    T: jnp.ndarray           # float32[4,4] source→target
    fitness: jnp.ndarray     # float32 — mean sq corr distance (PCL semantics)
    iterations: jnp.ndarray  # int32
    converged: jnp.ndarray   # bool — terminated via the transform-delta
    # epsilon (PCL criterion) or the error-plateau exit, NOT the iteration
    # cap. NOTE a deliberate tightening vs PCL: `hasConverged()` there
    # returns true even on a max-iterations exit (failure_after_max_iter_
    # defaults false), so `icp.hasConverged()` at pgo_node.cpp:443 virtually
    # never rejects capped ICP — here a verification still moving at the cap
    # is reported unconverged and the loop gate rejects it (tested on both
    # engines: test_verify_rejects_unconverged_icp).


def _nearest(src, src_mask, tgt, tgt_mask, chunk):
    """For each source point: (nearest target point [N,3], sq dist [N])."""
    n = src.shape[0]
    if (jax.default_backend() == "tpu"
            and n % nn_kernel.SRC_TILE == 0
            and tgt.shape[0] % nn_kernel.TGT_TILE == 0):
        # fused VMEM-resident kernel: distance tiles never touch HBM
        idx, d2 = nn_kernel.nearest_neighbor(src, tgt, tgt_mask)
        return tgt[idx], d2
    chunk = min(chunk, n)
    if n % chunk != 0:
        chunk = math.gcd(n, chunk)
    tsq = jnp.sum(tgt * tgt, axis=-1)
    big = jnp.float32(1e30)

    def body(i0):
        rows = jax.lax.dynamic_slice_in_dim(src, i0, chunk)
        d2 = (jnp.sum(rows * rows, -1)[:, None] + tsq[None, :]
              - 2.0 * jnp.matmul(rows, tgt.T, precision=jax.lax.Precision.DEFAULT))
        d2 = jnp.where(tgt_mask[None, :], d2, big)
        j = jnp.argmin(d2, axis=1)
        nn = tgt[j]
        # exact distances recomputed elementwise: the bf16 MXU pass is fine
        # for ARGMIN selection but not for the fitness statistic itself
        d2_exact = jnp.sum((rows - nn) ** 2, -1)
        d2_exact = jnp.where(tgt_mask[j], d2_exact, big)
        return nn, d2_exact

    starts = jnp.arange(0, n, chunk)
    nn, d2 = jax.lax.map(body, starts)
    return nn.reshape(n, 3), d2.reshape(n)


@functools.partial(jax.jit, static_argnames=("spec", "axis"))
def align(src, src_mask, tgt, tgt_mask, init_T, spec: IcpSpec,
          axis: str | None = None) -> IcpResult:
    """ICP aligning `src` onto `tgt`; init_T is a [4,4] initial guess.

    With `axis` set (inside a replicated-input `shard_map`), the SOURCE
    points shard over the mesh: each device finds nearest neighbors for its
    shard against the full (replicated) target and the Procrustes moment
    sums combine with deterministic all-gather-sums, so every device runs an
    identical iteration loop — the OMP-parallel correspondence loops of the
    reference's verification ICP (`gicp_omp_impl.hpp:76,262`; SURVEY §2d P1)
    as ICI collectives."""
    from xchu_slam_tpu.ops import ndt as _ndt
    max_d2 = spec.max_corr_dist ** 2
    if axis is not None:
        src_l, mask_l = _ndt._local_shard((src, src_mask), axis)
        reduce_ = lambda x: _ndt.shard_allsum(x, axis)
    else:
        src_l, mask_l = src, src_mask
        reduce_ = lambda x: x

    def body(state):
        T, it, _conv, prev_err = state
        cur = se3.transform_points(T, src_l)
        nn, d2 = _nearest(cur, mask_l, tgt, tgt_mask, spec.chunk)
        w = (mask_l & (d2 < max_d2)).astype(jnp.float32)
        wsum, s_s, s_t = reduce_((jnp.sum(w), jnp.sum(cur * w[:, None], 0),
                                  jnp.sum(nn * w[:, None], 0)))
        wsum = jnp.maximum(wsum, 1.0)
        mu_s = s_s / wsum
        mu_t = s_t / wsum
        xs = (cur - mu_s) * w[:, None]
        xt = nn - mu_t
        # M and the error sum are independent given the means — ONE packed
        # reduction carries both (shard_allsum packs leaves into a single
        # all-gather), so an ICP iteration costs 2 collectives, not 5
        M, err_sum = reduce_((jnp.matmul(xt.T, xs, precision=_PREC),
                              jnp.sum(d2 * w)))
        M = M / wsum  # 3×3 cross-cov
        U, _s, Vt = jnp.linalg.svd(M)
        det = jnp.linalg.det(jnp.matmul(U, Vt, precision=_PREC))
        S = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * 1.0).at[2, 2].set(det)
        R = jnp.matmul(jnp.matmul(U, S, precision=_PREC), Vt, precision=_PREC)
        t = mu_t - R @ mu_s
        dT = jnp.concatenate(
            [jnp.concatenate([R, t[:, None]], 1),
             jnp.array([[0.0, 0.0, 0.0, 1.0]], R.dtype)], 0)
        T_new = se3.compose(dT, T)
        err = err_sum / wsum
        # PCL transformation-epsilon criterion (pgo_node.cpp:441 relies on
        # setTransformationEpsilon(1e-6), applied by DefaultConvergenceCriteria
        # to the per-iteration transform DELTA): squared translation delta
        # below eps AND rotation delta below the matching angular scale
        # (2·(1−cosθ) ≈ θ²). The error-plateau exit is kept as a secondary
        # criterion (PCL's relative-MSE criterion analogue) — an ICP whose
        # error has plateaued but whose transform is still moving (e.g.
        # sliding along a self-similar surface) does NOT set it alone; see
        # test_plateaued_error_moving_transform_not_converged.
        trans_delta2 = jnp.sum(t * t)
        cos_theta = 0.5 * (jnp.trace(R) - 1.0)
        rot_delta2 = 2.0 * (1.0 - jnp.clip(cos_theta, -1.0, 1.0))
        conv_transform = (trans_delta2 < spec.trans_eps) & (
            rot_delta2 < spec.trans_eps)
        conv_plateau = jnp.abs(prev_err - err) < spec.trans_eps
        # the plateau exit only counts when the transform has also settled
        # to within a loose bound (1 cm² / ~0.57°): f32 Procrustes noise can
        # hold |Δt|² just above a 1e-6 eps forever, but a genuinely MOVING
        # transform with flat error must not read as converged
        settled = (trans_delta2 < 1e-4) & (rot_delta2 < 1e-4)
        conv = conv_transform | (conv_plateau & settled)
        return T_new, it + 1, conv, err

    def cond(state):
        _T, it, conv, _ = state
        return (~conv) & (it < spec.max_iterations)

    T, iters, conv, _ = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(init_T, jnp.float32), jnp.int32(0), jnp.bool_(False),
         jnp.float32(jnp.inf)),
    )
    # final fitness at the converged transform
    cur = se3.transform_points(T, src_l)
    _nn, d2 = _nearest(cur, mask_l, tgt, tgt_mask, spec.chunk)
    w = (mask_l & (d2 < max_d2)).astype(jnp.float32)
    num, den = reduce_((jnp.sum(d2 * w), jnp.sum(w)))
    fitness = num / jnp.maximum(den, 1.0)
    return IcpResult(T=T, fitness=fitness, iterations=iters, converged=conv)
