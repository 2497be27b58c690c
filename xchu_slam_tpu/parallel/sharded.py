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
from xchu_slam_tpu.utils import collectives, linalg, se3

try:  # jax>=0.6 stable API, with fallback for older trees
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

AXIS = "data"

# pose/coordinate contractions stay f32 on the MXU (see memory: bf16 trap)
_PREC = jax.lax.Precision.HIGHEST


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

        # broadcast rank-0's gradients/Hessians (ONE packed all-gather for
        # the (g, H) pair): reverse-mode transposes of the collective can
        # carry per-rank float skew, and any skew in control-flow inputs
        # diverges `while_loop` trip counts across ranks, deadlocking the
        # collectives inside the loop bodies.
        def bcast(x):
            return collectives.shard_bcast0(x, axis)

        return ndt.newton_align(loss, pose0, nspec, bcast=bcast)[:3]

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


def _make_pgo_body(axis: str, spec, K: int, L: int, D: int):
    """Factory for the factor-sharded pose-graph solve body (shared by
    `sharded_pgo_solve` and `slam_superstep`). The numerical body is the
    canonical `models.pose_graph.sharded_gn_solve` — the exact same code the
    mesh-mode SLAM engine runs via `pg.solve(axis=…)`; here the factor shards
    arrive physically sharded through `shard_map` in_specs instead of being
    sliced from replicated arrays."""
    from xchu_slam_tpu.models import pose_graph as pg

    def body(poses6, between_l, pairmask_l, ebase,
             li_l, lj_l, lT_l, linfo_l, lmask_l,
             gpsa_l, gpsm_l, gbase):
        return pg.sharded_gn_solve(
            poses6, between_l, pairmask_l, ebase[0, 0],
            li_l, lj_l, lT_l, linfo_l, lmask_l,
            gpsa_l, gpsm_l, gbase[0, 0], spec, axis)

    return body


def _pgo_inputs(graph, K: int, D: int):
    ebase = jnp.arange(0, K, K // D, dtype=jnp.int32).reshape(D, 1)
    gbase = jnp.array(ebase)
    pairmask = jnp.concatenate(
        [jnp.zeros(1, bool), graph.kf_mask[:-1] & graph.kf_mask[1:]])
    return ebase, gbase, pairmask


_PGO_IN_SPECS = lambda axis: (P(), P(axis, None, None), P(axis), P(axis),
                              P(axis), P(axis), P(axis, None, None), P(axis),
                              P(axis), P(axis), P(axis), P(axis))


def sharded_pgo_solve(mesh: Mesh, poses6, graph, spec):
    """Full pose-graph Gauss-Newton+CG solve with FACTORS sharded over the
    mesh (poses replicated): each device evaluates residuals/Jacobian products
    for its shard of between/loop/GPS factors; gradients, Hessian-vector
    products, and preconditioner blocks are combined with deterministic
    all-gather-sum reductions so every device runs an identical CG loop and
    holds identical optimized poses (SURVEY.md §2d P4/P5, §5 long-context:
    the keyframe/factor axis is the sharding axis of the backend)."""
    axis = mesh.axis_names[0]
    K = poses6.shape[0]
    L = graph.loop_i.shape[0]
    D = mesh.devices.size
    assert K % D == 0 and L % D == 0, (K, L, D)

    body = _make_pgo_body(axis, spec, K, L, D)
    ebase, gbase, pairmask = _pgo_inputs(graph, K, D)

    f = shard_map(
        body, mesh=mesh,
        in_specs=_PGO_IN_SPECS(axis),
        out_specs=P(),
        check_vma=False,
    )
    out = jax.jit(f)(poses6, graph.between_T, pairmask, ebase,
                     graph.loop_i, graph.loop_j, graph.loop_T,
                     graph.loop_info, graph.loop_mask,
                     graph.gps_alt, graph.gps_mask & graph.kf_mask, gbase)
    return jnp.where(graph.kf_mask[:, None], out, poses6)


# --------------------------------------------------------------------------- #
# full multi-chip SLAM superstep — ONE program, three sharding regimes
# --------------------------------------------------------------------------- #


def slam_superstep(mesh: Mesh, grid, src_xyz, src_mask, pose_guess,
                   gspec: vm.GridSpec, nspec: ndt.NdtSpec,
                   db, db_count, scspec: sc.ScSpec,
                   poses6, graph, pgspec):
    """ONE jit-compiled multi-chip SLAM step composing all three parallel
    regimes in a single `shard_map` program (SURVEY.md §2d P1/P4/P5):

      1. NDT alignment with the scan's POINTS sharded over the mesh (psum'd
         score/∇/H — the OMP-reduction analogue),
      2. Scan Context descriptor of the scan built by per-shard scatter-max +
         `pmax` over the mesh, retrieved against the KEYFRAME-sharded
         descriptor DB (local all-rotation MXU scoring + all_gather of
         per-device minima),
      3. full pose-graph Gauss-Newton+CG solve with FACTORS sharded over the
         mesh (deterministic all-gather-sum reductions; identical CG on all
         devices).

    Returns (pose, iterations, descriptor, (dist, idx, shift), opt_poses),
    all replicated. This is the program `__graft_entry__.dryrun_multichip`
    compiles and runs over the virtual mesh."""
    axis = mesh.axis_names[0]
    d1, d2 = ndt.gauss_constants(nspec.outlier_ratio, nspec.resolution)
    K_db = db.shape[0]
    D = mesh.devices.size
    shard = K_db // D
    Kp = poses6.shape[0]
    L = graph.loop_i.shape[0]
    assert K_db % D == 0 and Kp % D == 0 and L % D == 0, (K_db, Kp, L, D)

    pgo_body = _make_pgo_body(axis, pgspec, Kp, L, D)
    ebase, gbase, pairmask = _pgo_inputs(graph, Kp, D)

    def body(grid, xyz, mask, pose0, db_local, count, *pgo_args):
        # -- 1. points-sharded NDT align -------------------------------- #
        def loss(p):
            return ndt.ndt_loss(p, xyz, mask, grid, gspec, d1, d2,
                                psum_axis=axis)

        def bcast(x):
            return collectives.shard_bcast0(x, axis)

        pose, iters, _conv = ndt.newton_align(loss, pose0, nspec,
                                              bcast=bcast)[:3]

        # -- 2. descriptor (pmax of per-shard scatter-max) + retrieval -- #
        part = sc.descriptor_partial(xyz, mask, scspec)
        desc = sc.finalize_descriptor(jax.lax.pmax(part, axis))

        me = jax.lax.axis_index(axis)
        base = me * shard
        idxs = base + jnp.arange(shard)
        eligible = idxs < (count[0] - scspec.num_exclude_recent)
        dist, shift = sc.distance_all_rotations(desc, db_local, eligible,
                                                scspec)
        li = jnp.argmin(dist)
        local = jnp.stack([dist[li], (base + li).astype(jnp.float32),
                           shift[li].astype(jnp.float32)])
        allv = jax.lax.all_gather(local, axis)
        cand = allv[jnp.argmin(allv[:, 0])]

        # -- 3. factor-sharded pose-graph solve ------------------------- #
        opt = pgo_body(*pgo_args)
        return pose, iters, desc, cand, opt

    f = shard_map(
        body, mesh=mesh,
        in_specs=(_replicated(grid), P(axis, None), P(axis), P(),
                  P(axis, None, None), P()) + _PGO_IN_SPECS(axis),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    pose, iters, desc, cand, opt = jax.jit(f)(
        grid, src_xyz, src_mask, pose_guess,
        db, jnp.asarray([db_count], jnp.int32),
        poses6, graph.between_T, pairmask, ebase,
        graph.loop_i, graph.loop_j, graph.loop_T,
        graph.loop_info, graph.loop_mask,
        graph.gps_alt, graph.gps_mask & graph.kf_mask, gbase)
    opt = jnp.where(graph.kf_mask[:, None], opt, poses6)
    return pose, iters, desc, cand, opt


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
