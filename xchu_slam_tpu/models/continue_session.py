"""Session continuation: relocalize into a saved map, then KEEP MAPPING.

`localize` (models/relocalize.py) places single scans in a saved session's
map. This module goes further — the VERDICT-r3 stretch goal: seed a
`DeviceSlamPipeline` from a loaded checkpoint (keyframe DB + factor graph +
descriptors), relocalize the new session's first scan against the old map,
and CONTINUE mapping in the old session's frame:

- new keyframes append after the old session's in the same fixed-capacity DB,
- the first new keyframe is tied to the old graph twice: a between factor
  from the last old keyframe (derived from the relocalized pose) and a LOOP
  factor against the matched old keyframe carrying the actual ICP
  measurement,
- in-session loop detection then searches the WHOLE database, so later
  revisits close against BOTH sessions' keyframes and the solver corrects
  the new trajectory against the old map.

The reference's multi-session Scan Context support is an uncalled library
function (`Scancontext.cpp:267-328`); continuation has no reference
counterpart at all.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.models import device_pipeline as dp, odometry
from xchu_slam_tpu.models.pipeline import subsample_cloud
from xchu_slam_tpu.models.relocalize import SessionLocalizer
from xchu_slam_tpu.ops import isc as isc_ops, scancontext as sc
from xchu_slam_tpu.ops.filter import filter_scan
from xchu_slam_tpu.types import Cloud, make_cloud
from xchu_slam_tpu.utils import se3


class ContinuationError(RuntimeError):
    """Raised when the first scan cannot be placed in the saved map."""


def continue_session(checkpoint_path: str, first_xyz, first_intensity=None,
                     stamp: float = 0.0,
                     log_capacity: int = 8192,
                     mesh=None) -> dp.DeviceSlamPipeline:
    """Load a saved session and return a DeviceSlamPipeline that continues it.

    The returned pipeline has already consumed `first_xyz` (relocalized and
    stored as the first new keyframe); feed subsequent scans with
    `process_scan`/`process_chunk` as usual. Raises ContinuationError if
    relocalization fails (no retrieval hit or ICP verification failed) —
    callers may fall back to mapping a fresh session.

    With `mesh` (a 1-axis `jax.sharding.Mesh`), the continued pipeline runs
    as the SPMD mesh engine: the continuation seed itself is a one-time
    host-side, collective-free state edit (relocalization + DB/graph
    append), after which the seeded state is replicated onto the mesh and
    all subsequent steps run sharded (VERDICT r4 item 8)."""
    from xchu_slam_tpu.utils.checkpoint import load_checkpoint

    old = load_checkpoint(checkpoint_path)
    if not hasattr(old, "state") or old.state is None:
        raise ContinuationError(
            "continuation requires a device-engine checkpoint "
            "(run-sim --engine device --checkpoint-every ...)")
    cfg = old.cfg
    state = old.state
    K0 = int(np.asarray(state.db.count))
    if K0 >= cfg.pgo.max_keyframes:
        raise ContinuationError("saved session already at keyframe capacity")

    cloud = first_xyz if isinstance(first_xyz, Cloud) else make_cloud(
        first_xyz, first_intensity, capacity=cfg.filter.max_raw_points)

    # -- 1. relocalize the first scan against the saved map ---------------- #
    loc = SessionLocalizer(state.db, cfg)
    r = loc.localize(cloud)
    if not r.found:
        raise ContinuationError(
            f"relocalization failed (sc_dist={r.sc_dist:.3f}, "
            f"icp_fitness={r.icp_fitness:.3f}, converged={r.icp_converged})")
    reloc_pose = jnp.asarray(r.pose, jnp.float32)

    # -- 2. store the first new keyframe K0, tied to the old graph --------- #
    # COUPLING: the db._replace field set and descriptor construction below
    # mirror device_pipeline._add_keyframe_branch (and the log row mirrors
    # _seed_body's 16-column format) as a one-time HOST-side seed — the
    # traced branch cannot be reused for a host edit of restored state. A
    # db/log layout or descriptor-source change there must be mirrored here
    # (tests/test_relocalize.py's continuation round-trip catches drift).
    filt = filter_scan(cloud, cfg.filter)
    spec = dp.spec_from_config(cfg, kf_points=old.kf_points,
                               log_capacity=log_capacity)
    cxyz, cmask, _ = subsample_cloud(filt.xyz, filt.mask, old.kf_points)
    sc_desc = sc.make_descriptor(filt.xyz, filt.mask, spec.scspec)
    if spec.method == "isc":
        isc_desc = isc_ops.make_descriptor(filt.xyz, filt.intensity,
                                           filt.mask, spec.iscspec)
    else:
        isc_desc = state.db.isc_db[0] * 0.0

    db = state.db
    travel0 = jnp.maximum(db.travel[K0 - 1], 0.0)
    db = db._replace(
        poses=db.poses.at[K0].set(reloc_pose),
        opt_poses=db.opt_poses.at[K0].set(reloc_pose),
        stamps=db.stamps.at[K0].set(jnp.float32(stamp)),
        travel=db.travel.at[K0].set(travel0),
        clouds=db.clouds.at[K0].set(cxyz),
        cloud_mask=db.cloud_mask.at[K0].set(cmask),
        sc_db=db.sc_db.at[K0].set(sc_desc),
        isc_db=db.isc_db.at[K0].set(isc_desc),
        count=jnp.int32(K0 + 1),
    )
    # between factor old-tail -> new-head, both poses in the MAP frame
    # (opt_poses) since the relocalized pose lives there
    Z = jnp.matmul(se3.inverse(se3.pose_to_matrix(db.opt_poses[K0 - 1])),
                   se3.pose_to_matrix(reloc_pose))
    graph = state.graph._replace(
        between_T=state.graph.between_T.at[K0].set(Z),
        kf_mask=state.graph.kf_mask.at[K0].set(True),
    )
    # loop factor carrying the actual relocalization measurement: res.T of
    # the localizer's ICP maps the new keyframe's body cloud into the
    # matched keyframe's frame — identical convention to in-session loops
    # (device_pipeline._verify_and_apply)
    q = int(np.asarray(state.loop_count))
    if q < spec.gspec.max_loops:
        T_rel = jnp.matmul(
            se3.inverse(se3.pose_to_matrix(db.opt_poses[r.kf_idx])),
            se3.pose_to_matrix(reloc_pose))
        graph = graph._replace(
            loop_i=graph.loop_i.at[q].set(jnp.int32(r.kf_idx)),
            loop_j=graph.loop_j.at[q].set(jnp.int32(K0)),
            loop_T=graph.loop_T.at[q].set(T_rel),
            loop_info=graph.loop_info.at[q].set(
                1.0 / jnp.maximum(jnp.float32(r.icp_fitness), 1e-2)),
            loop_mask=graph.loop_mask.at[q].set(True),
        )
        q += 1

    # -- 3. continued engine state: fresh odometry seeded at the
    #       relocalized pose, fresh log ring, counters carried over -------- #
    odom0 = odometry.init_state(spec.ospec, reloc_pose, filt.xyz, filt.mask)
    new_state = dp.DevState(
        odom=odom0,
        db=db,
        graph=graph,
        kf_accum=jnp.float32(0.0),
        travel=jnp.array(travel0),
        # distinct buffer from odom.pose: device_step donates the whole
        # state, and donated leaves must not alias each other
        last_kf_odom=jnp.array(reloc_pose),
        loop_count=jnp.int32(q),
        scan_count=jnp.int32(1),
        imu_vel=jnp.zeros(3, jnp.float32),
        last_stamp=jnp.float32(stamp),
        log=jnp.zeros((spec.log_capacity, 16), jnp.float32),
        diag=jnp.asarray(dp._DIAG_RESET),
    )
    row = jnp.concatenate(
        [reloc_pose, jnp.array([0.0, 0.0, 1.0, 1.0], jnp.float32),
         jnp.asarray(stamp, jnp.float32)[None], jnp.asarray(dp._DIAG_RESET)])
    new_state = new_state._replace(log=new_state.log.at[0].set(row))

    pipe = dp.DeviceSlamPipeline(cfg, kf_points=old.kf_points,
                                 log_capacity=log_capacity, mesh=mesh)
    # identity when mesh is None; otherwise replicate the seeded state onto
    # every mesh device so the SPMD step bodies see consistent inputs
    pipe.state = pipe._replicate(new_state)
    pipe._scans_fed = 1
    pipe.continuation = {"matched_kf": int(r.kf_idx),
                         "reloc_pose": np.asarray(r.pose),
                         "sc_dist": float(r.sc_dist),
                         "icp_fitness": float(r.icp_fitness),
                         "old_keyframes": K0}
    return pipe
