"""Multi-chip SPMD execution over a `jax.sharding.Mesh`.

TPU-native replacement for the reference's concurrency stack (SURVEY.md §2d):
- P1/P5 (OMP parallel-for over points + per-thread partial-sum reduction) →
  points sharded over the mesh's data axis; 6×6 Hessian / gradient partials
  combined with `psum` over ICI.
- descriptor retrieval (nanoflann kd-tree / linear scans) → Scan Context DB
  sharded over the keyframe axis; local best match + `all_gather` of
  (dist, idx) pairs.
- GTSAM backend → pose-graph factors sharded over the keyframe axis; CG run
  redundantly on every device with psum-reduced gradients/Hvps so all devices
  hold identical optimized poses (deterministic, no divergence).

Everything here is `shard_map` over an explicit Mesh: the sharding layout is
the program, XLA inserts the collectives.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from xchu_slam_tpu.ops import ndt, scancontext as sc, voxel_map as vm
from xchu_slam_tpu.utils import linalg, se3

try:  # jax>=0.6 stable API, with fallback for older trees
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _replicated(tree):
    return jax.tree.map(lambda _: P(), tree)


# --------------------------------------------------------------------------- #
# sharded NDT alignment (points split over the mesh, psum'd derivatives)
# --------------------------------------------------------------------------- #


def sharded_ndt_align(mesh: Mesh, grid, src_xyz, src_mask, init_pose,
                      gspec: vm.GridSpec, nspec: ndt.NdtSpec):
    """NDT align with the source cloud sharded over the mesh data axis.

    Every device runs the identical Newton/line-search control flow on psum'd
    scalars, so the result is bit-identical across devices and returned
    replicated. The voxel grid is replicated (it is the 'model'); points are
    the 'batch'."""
    axis = mesh.axis_names[0]
    d1, d2 = ndt.gauss_constants(nspec.outlier_ratio, nspec.resolution)

    def body(grid, xyz, mask, pose0):
        def loss(p):
            return ndt.ndt_loss(p, xyz, mask, grid, gspec, d1, d2,
                                psum_axis=axis)

        # broadcast rank-0's gradients/Hessians: reverse-mode transposes of
        # the collective can carry per-rank float skew, and any skew in
        # control-flow inputs diverges `while_loop` trip counts across ranks,
        # deadlocking the collectives inside the loop bodies.
        def bcast(x):
            return jax.lax.all_gather(x, axis)[0]

        return ndt.newton_align(loss, pose0, nspec, bcast=bcast)

    f = shard_map(
        body, mesh=mesh,
        in_specs=(_replicated(grid), P(axis, None), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(f)(grid, src_xyz, src_mask, init_pose)


# --------------------------------------------------------------------------- #
# sharded Scan Context retrieval (descriptor DB split over keyframe axis)
# --------------------------------------------------------------------------- #


def sharded_sc_detect(mesh: Mesh, query, db, db_count, spec: sc.ScSpec):
    """Loop retrieval with the descriptor DB sharded across devices.

    Each device scores its keyframe shard (full rotation search on the MXU),
    then the global best is found by all-gathering the per-device minima —
    the distributed analogue of SURVEY.md §5's 'descriptor DB partitioned per
    host with local top-k + all_gather of candidates'."""
    axis = mesh.axis_names[0]
    K = db.shape[0]
    n_dev = mesh.devices.size
    shard = K // n_dev

    def body(q, db_local, count):
        me = jax.lax.axis_index(axis)
        base = me * shard
        idxs = base + jnp.arange(shard)
        eligible = idxs < (count[0] - spec.num_exclude_recent)
        dist, shift = sc.distance_all_rotations(q, db_local, eligible, spec)
        li = jnp.argmin(dist)
        local = jnp.stack([dist[li], (base + li).astype(jnp.float32),
                           shift[li].astype(jnp.float32)])
        allv = jax.lax.all_gather(local, axis)            # [n_dev, 3]
        best = jnp.argmin(allv[:, 0])
        return allv[best]

    f = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis, None, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = jax.jit(f)(query, db, jnp.asarray([db_count], jnp.int32))
    dist, idx, shift = out[0], out[1].astype(jnp.int32), out[2]
    found = jnp.isfinite(dist) & (dist < spec.dist_thresh)
    yaw = shift * (2.0 * jnp.pi / spec.num_sector)
    yaw = jnp.arctan2(jnp.sin(yaw), jnp.cos(yaw))
    return sc.LoopCandidate(
        idx=jnp.where(found, idx, -1).astype(jnp.int32),
        dist=dist, yaw=yaw, found=found)


# --------------------------------------------------------------------------- #
# sharded pose-graph solve (factors split over keyframe axis)
# --------------------------------------------------------------------------- #


def sharded_pgo_hvp_demo(mesh: Mesh, poses6, graph, spec):
    """Demonstration/validation kernel: psum-reduced gradient of the
    pose-graph objective with odometry factors sharded over devices.

    (The production solve currently runs single-device inside `pg.solve`; this
    validates the distributed reduction path used by `slam_superstep`.)"""
    from xchu_slam_tpu.models import pose_graph as pg

    axis = mesh.axis_names[0]

    def body(poses6, between_T, kf_mask_l, base_idx):
        T = se3.pose_to_matrix(poses6)

        def local_obj(xi):
            K = poses6.shape[0]
            mask0 = jnp.ones((K, 1), xi.dtype).at[0, 0].set(0.0)
            Tn = jnp.matmul(T, se3.se3_exp(xi * mask0))
            # local shard's odometry factors: edges (gi-1, gi)
            gi = base_idx[0] + jnp.arange(between_T.shape[0])
            gi = jnp.clip(gi, 1, K - 1)
            r = jax.vmap(pg._between_residual)(Tn[gi - 1], Tn[gi], between_T)
            w = jnp.where(kf_mask_l[:, None],
                          jnp.array([spec.odom_info_t] * 3 +
                                    [spec.odom_info_r] * 3, xi.dtype)[None, :],
                          0.0)
            return 0.5 * jnp.sum(w * r * r)

        g = jax.grad(local_obj)(jnp.zeros_like(poses6))
        return jax.lax.psum(g, axis)

    n_dev = mesh.devices.size
    K = poses6.shape[0]
    shard = K // n_dev
    base = jnp.arange(0, K, shard, dtype=jnp.int32).reshape(n_dev, 1)
    kf_mask_local = graph.kf_mask & (jnp.arange(K) >= 1)

    f = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis, None, None), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(f)(poses6, graph.between_T, kf_mask_local, base)
