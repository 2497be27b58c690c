"""Generalized-ICP (plane-to-plane / distribution-to-distribution).

TPU-native equivalent of `pclomp::GeneralizedIterativeClosestPoint`
(`pclomp/gicp_omp.h:59`, `gicp_omp_impl.hpp` — compiled into the reference's
libs but never instantiated by any node, SURVEY.md §2b). Implemented the
TPU way: per-point covariances come from voxel statistics instead of per-point
k-NN covariance loops, correspondences are DIRECT7 voxel lookups, and the
distribution-to-distribution Mahalanobis objective

    Σ δᵀ (C_tgt + R·C_src·Rᵀ)⁻¹ δ,   δ = R·q + t − μ_tgt

is minimized by the shared Newton/line-search engine (`ops.ndt.newton_align`)
with autodiff derivatives.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from xchu_slam_tpu.ops import ndt, voxel_map as vm
from xchu_slam_tpu.utils import linalg, se3

_PREC = jax.lax.Precision.HIGHEST


class GicpSpec(NamedTuple):
    max_iterations: int = 30
    trans_eps: float = 1e-3
    step_size: float = 0.2
    ls_max_trials: int = 10
    cov_epsilon: float = 1e-3   # pcl GICP's (1,1,ε) surface regularization


def source_covariances(src_xyz, src_mask, spec: vm.GridSpec):
    """Per-point covariance from the source scan's own voxel statistics.

    (The reference computes k=20-NN covariances per point,
    gicp_omp_impl.hpp:76; voxel statistics are the batched analogue.)"""
    grid = vm.make_grid(spec, vm.centered_origin(spec, jnp.zeros(3)))
    grid = vm.insert_points(grid, src_xyz, src_mask, spec)
    grid = vm.finalize(grid, spec)
    # gather each point's own voxel covariance (centre of DIRECT7)
    mean_w, icov6, valid = vm.lookup7(grid, spec, src_xyz)
    # recover covariance by inverting icov (regularized in finalize)
    cov = linalg.inv3(linalg.sym6_to_mat(icov6[:, 0]))
    ok = valid[:, 0]
    eye = jnp.eye(3, dtype=src_xyz.dtype)
    return jnp.where(ok[:, None, None], cov, eye * 0.01), ok


def gicp_loss(pose, src_xyz, src_mask, src_cov, grid, gspec: vm.GridSpec,
              eps: float):
    R = se3.euler_to_matrix(pose[3:6])
    pts = jnp.matmul(src_xyz, R.T, precision=_PREC) + pose[:3]
    mean_w, icov6, vvalid = vm.lookup7(grid, gspec, pts)
    # target covariance from its inverse (centre voxel suffices per pair)
    C_tgt = linalg.inv3(linalg.sym6_to_mat(icov6))             # [N,7,3,3]
    C_src_rot = jnp.einsum("ab,nbc,dc->nad", R, src_cov, R,
                           precision=_PREC)                     # [N,3,3]
    C = C_tgt + C_src_rot[:, None] + eps * jnp.eye(3, dtype=pts.dtype)
    Minv = linalg.inv3(C)
    delta = pts[:, None, :] - mean_w
    m = jnp.einsum("nvab,nvb->nva", Minv, delta, precision=_PREC)
    d2 = jnp.sum(delta * m, -1)
    use = vvalid & src_mask[:, None]
    return jnp.sum(jnp.where(use, d2, 0.0))


class GicpResult(NamedTuple):
    pose: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray
    loss: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("gspec", "spec"))
def align(src_xyz, src_mask, grid, init_pose, gspec: vm.GridSpec,
          spec: GicpSpec = GicpSpec()) -> GicpResult:
    """GICP alignment of a source scan onto a voxel-statistics target grid."""
    src_cov, _ok = source_covariances(src_xyz, src_mask, gspec)

    def loss(p):
        return gicp_loss(p, src_xyz, src_mask, src_cov, grid, gspec,
                         spec.cov_epsilon)

    nspec = ndt.NdtSpec(
        step_size=spec.step_size,
        trans_eps=spec.trans_eps,
        max_iterations=spec.max_iterations,
        ls_max_trials=spec.ls_max_trials,
        closed_form=False,
    )
    pose, iters, conv, _ctx, _phi = ndt.newton_align(loss, init_pose, nspec)
    return GicpResult(pose=pose, iterations=iters, converged=conv,
                      loss=loss(pose))
