"""Fully on-device SLAM pipeline: one XLA program per scan, zero readbacks.

The host-orchestrated `models/pipeline.py` mirrors the reference's process
split (filter_node → odom_node → pgo_node) with host control flow between
device stages. That costs one device→host pose readback per scan — and on a
remote-attached TPU the first readback in a process permanently degrades
dispatch pipelining (measured ~900 → ~53 scans/s; see bench.py). This module
is the end-point of the TPU-native design instead: the ENTIRE SLAM iteration —

  filter → NDT odometry → keyframe gate → cloud subsample → descriptors →
  loop retrieval (SC/ISC/radius) → ICP verification → pose-graph solve

— is a single jit-compiled, donated-state device program. The host loop only
feeds staged clouds (io/prefetch.py) and never reads anything until
`finalize()`. All branching the reference does on the CPU (keyframe gating
`pgo_node.cpp:188-205`, detection cadence `:390-402`, ICP accept
`:441-448`) happens under `lax.cond` on device, so non-keyframe scans skip
the heavy branches at runtime.

Behavioral parity is with `SlamPipeline` in synchronous mode (tests compare
the two end to end); the underlying ops are the same jitted functions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.config import SlamConfig
from xchu_slam_tpu.models import odometry, pose_graph as pg
from xchu_slam_tpu.models.pipeline import KfDb, build_submap, empty_db, subsample_cloud
from xchu_slam_tpu.ops import icp, isc as isc_ops, ndt, scancontext as sc, voxel_map as vm
from xchu_slam_tpu.ops.filter import filter_scan
from xchu_slam_tpu.types import Cloud
from xchu_slam_tpu.utils import se3

_PREC = jax.lax.Precision.HIGHEST


class DevSpec(NamedTuple):
    """Static pipeline parameters (hashable; closed over by the jit)."""

    fcfg: object                # FilterConfig
    ospec: odometry.OdomSpec
    scspec: sc.ScSpec
    iscspec: isc_ops.IscSpec
    icpspec: icp.IcpSpec
    gspec: pg.GraphSpec
    kf_points: int
    keyframe_gap: float
    detect_period: int
    method: str                 # "sc" | "isc" | "radius" | "none"
    radius_search: float
    min_time_diff: float
    max_loop_dist: float
    icp_fitness_thresh: float
    max_correction: float
    submap_half_width: int
    submap_points: int
    use_gps: bool
    use_sc_yaw: bool = True
    log_capacity: int = 8192
    # IMU / wheel-odometry NDT guess (reference use_imu/use_odom launch
    # modes, odom_node.cpp:237-254,494-663): per-scan sensor windows arrive
    # as traced inputs and are integrated ON DEVICE into the guess delta
    use_imu: bool = False
    use_odom: bool = False
    # mesh axis name for SPMD execution (None = single device). With an axis,
    # the step body runs inside a replicated-input `shard_map`: state storage
    # is replicated, compute is sharded — NDT points, SC/ISC DB scoring, ICP
    # correspondences, and pose-graph factors each shard over the mesh with
    # deterministic all-gather-sum reductions (SURVEY.md §2d P1/P4/P5).
    axis: str | None = None


def spec_from_config(cfg: SlamConfig, kf_points: int = 4096,
                     log_capacity: int = 8192,
                     axis: str | None = None) -> DevSpec:
    return DevSpec(
        fcfg=cfg.filter,
        ospec=odometry.spec_from_config(cfg),
        scspec=sc.spec_from_config(cfg.sc),
        iscspec=isc_ops.spec_from_config(cfg.isc),
        icpspec=icp.spec_from_config(cfg.loop),
        gspec=pg.spec_from_config(cfg.pgo),
        kf_points=kf_points,
        keyframe_gap=cfg.pgo.keyframe_gap,
        detect_period=cfg.loop.detect_period,
        method=cfg.loop.method,
        radius_search=cfg.loop.radius_search,
        min_time_diff=cfg.loop.min_time_diff,
        max_loop_dist=cfg.loop.max_loop_dist,
        icp_fitness_thresh=cfg.loop.icp_fitness_thresh,
        max_correction=cfg.loop.max_correction,
        submap_half_width=cfg.loop.submap_half_width,
        submap_points=cfg.loop.submap_points,
        use_gps=cfg.pgo.use_gps,
        use_sc_yaw=cfg.loop.use_sc_yaw,
        log_capacity=log_capacity,
        axis=axis,
        use_imu=cfg.odom.use_imu,
        use_odom=cfg.odom.use_odom,
    )


class GuessWindows(NamedTuple):
    """Per-scan external-guess sensor windows fed to the device step.

    `imu` is an ops.imu.ImuWindow, `wheel` an ops.imu.OdomWindow; either may
    be None when the corresponding mode is off (None subtrees are valid jit
    inputs). For the chunk path every leaf gains a leading [chunk] axis."""

    imu: object
    wheel: object


class DevState(NamedTuple):
    odom: odometry.OdomState
    db: KfDb
    graph: pg.GraphData
    kf_accum: jnp.ndarray      # f32 — travel since last keyframe
    travel: jnp.ndarray        # f32 — total odometric travel
    last_kf_odom: jnp.ndarray  # f32[6] — odometric pose at last keyframe
    loop_count: jnp.ndarray    # i32
    scan_count: jnp.ndarray    # i32
    imu_vel: jnp.ndarray       # f32[3] — IMU velocity estimate (world frame,
    #                            the reference's current_velocity_imu_*; reset
    #                            from the SLAM pose delta every scan,
    #                            odom_node.cpp:312-317)
    last_stamp: jnp.ndarray    # f32 — previous scan's stamp (for the reset dt)
    log: jnp.ndarray           # f32[LOG,16]: pose6, iters, fitness, mfrac,
    #                            is_kf, stamp, + loop diagnostics: cand idx,
    #                            retrieval found, icp fitness, icp correction,
    #                            verify ran (the reference's loop accept/reject
    #                            console logs, pgo_node.cpp:444-447, as data)
    diag: jnp.ndarray          # f32[5] — per-scan loop diagnostics scratch


def _sc_radius_candidate(state: DevState, k, stamp, spec: DevSpec):
    """Loop method 0 (reference pgo_node.cpp:299-342) on device."""
    db = state.db
    K = db.poses.shape[0]
    pos = db.opt_poses[k, :2]
    d = jnp.linalg.norm(db.opt_poses[:, :2] - pos[None], axis=-1)
    eligible = (jnp.arange(K) < k) & (db.stamps < stamp - spec.min_time_diff)
    d = jnp.where(eligible, d, jnp.inf)
    best = jnp.argmin(d)
    found = d[best] < spec.radius_search
    return jnp.where(found, best, -1).astype(jnp.int32), found


def _detect_candidate(state: DevState, k, stamp, spec: DevSpec):
    """Method-dispatched retrieval (static choice, traced data).

    Returns (idx, found, yaw) — yaw is the descriptor-measured relative
    heading ψ_cand − ψ_query (0 for methods without a rotation estimate)."""
    db = state.db
    if spec.method == "sc":
        res = sc.detect_loop(db.sc_db[k], db.sc_db, db.count, spec.scspec,
                             axis=spec.axis, cur=k)
        return res.idx, res.found, res.yaw
    if spec.method == "isc":
        res = isc_ops.detect_loop(db.isc_db[k], db.isc_db, db.count,
                                  db.poses[:, :3], db.travel, spec.iscspec,
                                  axis=spec.axis, cur=k)
        return res.idx, res.found, res.yaw
    if spec.method == "radius":
        idx, found = _sc_radius_candidate(state, k, stamp, spec)
        return idx, found, jnp.float32(0.0)
    return jnp.int32(-1), jnp.bool_(False), jnp.float32(0.0)


def _verify_and_apply(state: DevState, k, cand, yaw, spec: DevSpec) -> DevState:
    """ICP-verify candidate and, on acceptance, add the loop factor and
    re-solve the graph — all under conds so rejected/absent candidates cost
    one distance check."""
    db = state.db

    def verify(state: DevState) -> DevState:
        db = state.db
        tgt_xyz, tgt_mask, _ = build_submap(
            db, cand, cand, spec.submap_half_width, spec.submap_points)
        T_init = jnp.matmul(
            se3.inverse(se3.pose_to_matrix(db.opt_poses[cand])),
            se3.pose_to_matrix(db.opt_poses[k]),
            precision=_PREC,
        )
        if spec.use_sc_yaw and spec.method in ("sc", "isc"):
            # heading from the descriptor's rotation estimate (−yaw = query's
            # heading in cand's frame) instead of the drifted pose difference;
            # the reference discards this value (pgo_node.cpp:344-363)
            p_init = se3.matrix_to_pose(T_init)
            T_init = se3.pose_to_matrix(p_init.at[5].set(-yaw))
        res = icp.align(db.clouds[k], db.cloud_mask[k], tgt_xyz, tgt_mask,
                        T_init, spec.icpspec, axis=spec.axis)
        corr = jnp.linalg.norm(res.T[:3, 3] - T_init[:3, 3])
        # accept only CONVERGED ICP (reference `icp.hasConverged() &&
        # fitness <= thresh`, pgo_node.cpp:441-448): a verification that hits
        # the iteration cap while still moving must not become a loop factor
        ok = (res.converged
              & (res.fitness <= spec.icp_fitness_thresh)
              & (corr <= spec.max_correction)
              & (state.loop_count < spec.gspec.max_loops))
        state = state._replace(diag=state.diag.at[2].set(res.fitness)
                               .at[3].set(corr).at[4].set(1.0))

        def apply(state: DevState) -> DevState:
            q = state.loop_count
            graph = state.graph._replace(
                loop_i=state.graph.loop_i.at[q].set(cand),
                loop_j=state.graph.loop_j.at[q].set(k),
                loop_T=state.graph.loop_T.at[q].set(res.T),
                loop_info=state.graph.loop_info.at[q].set(
                    1.0 / jnp.maximum(res.fitness, 1e-2)),
                loop_mask=state.graph.loop_mask.at[q].set(True),
            )
            state = state._replace(graph=graph, loop_count=q + 1)

            # warm-started in-step solve (pg.inloop_spec), at the configured
            # cadence — the iSAM2-incrementality analogue; finalize() always
            # runs the full-strength solve
            def solve(state: DevState) -> DevState:
                opt = pg.solve(state.db.opt_poses, state.graph,
                               pg.inloop_spec(spec.gspec), axis=spec.axis)
                return state._replace(db=state.db._replace(opt_poses=opt))

            if spec.gspec.solve_every <= 1:
                return solve(state)
            return jax.lax.cond(
                state.loop_count % spec.gspec.solve_every == 0,
                solve, lambda s: s, state)

        return jax.lax.cond(ok, apply, lambda s: s, state)

    # 2-D sanity gate (reference pgo_node.cpp:335-338)
    d2 = jnp.linalg.norm(db.opt_poses[k, :2] - db.opt_poses[cand, :2])
    do_verify = (cand >= 0) & (d2 <= spec.max_loop_dist)
    return jax.lax.cond(do_verify, verify, lambda s: s, state)


def _add_keyframe_branch(state: DevState, filt: Cloud, pose, stamp,
                         gps_alt, gps_valid, spec: DevSpec) -> DevState:
    db = state.db
    k = db.count  # new keyframe index

    cxyz, cmask, _src_idx = subsample_cloud(filt.xyz, filt.mask, spec.kf_points)
    # descriptors from the FULL filtered cloud (reference pgo_node.cpp:234-247
    # computes SC/ISC on /filtered_points); the subsample only bounds the
    # stored ICP submap clouds
    sc_desc = sc.make_descriptor(filt.xyz, filt.mask, spec.scspec)
    if spec.method == "isc":
        isc_desc = isc_ops.make_descriptor(filt.xyz, filt.intensity,
                                           filt.mask, spec.iscspec)
    else:
        isc_desc = db.isc_db[0] * 0.0

    # optimized pose chains onto the previous optimized pose by the odometric
    # increment (what iSAM2 yields for a pure chain extension)
    Z = jnp.matmul(
        se3.inverse(se3.pose_to_matrix(state.last_kf_odom)),
        se3.pose_to_matrix(pose),
        precision=_PREC,
    )
    prev_opt = se3.pose_to_matrix(db.opt_poses[jnp.maximum(k - 1, 0)])
    opt_pose = se3.matrix_to_pose(jnp.matmul(prev_opt, Z, precision=_PREC))
    opt_pose = jnp.where(k == 0, pose, opt_pose)

    db = db._replace(
        poses=db.poses.at[k].set(pose),
        opt_poses=db.opt_poses.at[k].set(opt_pose),
        stamps=db.stamps.at[k].set(stamp),
        travel=db.travel.at[k].set(state.travel),
        clouds=db.clouds.at[k].set(cxyz),
        cloud_mask=db.cloud_mask.at[k].set(cmask),
        sc_db=db.sc_db.at[k].set(sc_desc),
        isc_db=db.isc_db.at[k].set(isc_desc),
        count=k + 1,
    )
    graph = state.graph._replace(
        between_T=jnp.where(k >= 1,
                            state.graph.between_T.at[k].set(Z),
                            state.graph.between_T),
        kf_mask=state.graph.kf_mask.at[k].set(True),
    )
    if spec.use_gps:
        graph = graph._replace(
            gps_alt=jnp.where(gps_valid,
                              graph.gps_alt.at[k].set(gps_alt),
                              graph.gps_alt),
            gps_mask=jnp.where(gps_valid,
                               graph.gps_mask.at[k].set(True),
                               graph.gps_mask),
        )
    state = state._replace(
        db=db, graph=graph,
        kf_accum=jnp.float32(0.0),
        last_kf_odom=pose,
    )

    # loop detection every detect_period-th keyframe (reference 2 Hz thread)
    if spec.method != "none":
        do_detect = (k >= 1) & (k % spec.detect_period == 0)

        def detect(state: DevState) -> DevState:
            cand, found, yaw = _detect_candidate(state, k, stamp, spec)
            cand = jnp.where(found, cand, jnp.int32(-1))
            state = state._replace(
                diag=state.diag.at[0].set(cand.astype(jnp.float32))
                .at[1].set(found.astype(jnp.float32)))
            return _verify_and_apply(state, k, cand, yaw, spec)

        state = jax.lax.cond(do_detect, detect, lambda s: s, state)
    return state


@functools.partial(jax.jit, static_argnames=("spec",),
                   donate_argnames=("state",))
def device_step(state: DevState, cloud: Cloud, stamp, gps_alt, gps_valid,
                spec: DevSpec, win: GuessWindows | None = None) -> DevState:
    """One full SLAM iteration on device. Donates and returns the state."""
    return _device_step_body(state, cloud, stamp, gps_alt, gps_valid, spec,
                             win)


_DIAG_RESET = np.array([-1.0, 0.0, 0.0, 0.0, 0.0], np.float32)


def _fetch(x):
    """np.asarray that also works for non-fully-addressable (multi-PROCESS
    mesh) arrays: every engine array is replicated (out_specs P()), so any
    addressable shard holds the full value."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.asarray(x.addressable_shards[0].data)
    return np.asarray(x)


def _ext_guess(state: DevState, win: GuessWindows | None, spec: DevSpec):
    """On-device IMU / wheel-odom guess integration (reference ImuCalc /
    OdomCalc / ImuOdomCalc, odom_node.cpp:494-663). Returns
    (state, ext_delta, use_ext): use_ext is False when the scan's window is
    fully masked (e.g. the first scan), falling back to constant velocity."""
    from xchu_slam_tpu.ops import imu as imu_ops

    if win is None or not (spec.use_imu or spec.use_odom):
        return state, jnp.zeros(6, jnp.float32), jnp.bool_(False)
    pose0 = state.odom.pose
    d_imu = d_wheel = None
    have = jnp.bool_(True)
    if spec.use_imu and win.imu is not None:
        d_imu, new_st = imu_ops.integrate_imu(
            win.imu, pose0, imu_ops.ImuState(velocity=state.imu_vel))
        state = state._replace(imu_vel=new_st.velocity)
        have = have & jnp.any(win.imu.mask)
    if spec.use_odom and win.wheel is not None:
        d_wheel = imu_ops.integrate_wheel_odom(win.wheel, pose0)
        have = have & jnp.any(win.wheel.mask)
    if d_imu is not None and d_wheel is not None:
        delta = imu_ops.combine_imu_odom(d_imu, d_wheel)
    elif d_imu is not None:
        delta = d_imu
    elif d_wheel is not None:
        delta = d_wheel
    else:
        return state, jnp.zeros(6, jnp.float32), jnp.bool_(False)
    return state, delta, have


def _device_step_body(state: DevState, cloud: Cloud, stamp, gps_alt,
                      gps_valid, spec: DevSpec,
                      win: GuessWindows | None = None) -> DevState:
    state = state._replace(diag=jnp.asarray(_DIAG_RESET))
    filt = filter_scan(cloud, spec.fcfg)
    prev_pose = state.odom.pose
    state, ext_delta, use_ext = _ext_guess(state, win, spec)
    new_odom, out = odometry.step(state.odom, filt.xyz, filt.mask, spec.ospec,
                                  ext_delta, use_ext, axis=spec.axis)
    pose = out.pose
    step_d = jnp.linalg.norm(pose[:2] - prev_pose[:2])
    state = state._replace(
        odom=new_odom,
        kf_accum=state.kf_accum + step_d,
        travel=state.travel + step_d,
    )
    if spec.use_imu:
        # reset the IMU velocity from the SLAM result every scan (reference
        # odom_node.cpp:312-317): pure double integration is a random walk in
        # velocity and degrades below constant-velocity on long runs
        dt = jnp.asarray(stamp, jnp.float32) - state.last_stamp
        vel_slam = (pose[:3] - prev_pose[:3]) / jnp.maximum(dt, 1e-6)
        state = state._replace(
            imu_vel=jnp.where(dt > 1e-6, vel_slam, state.imu_vel))
    state = state._replace(last_stamp=jnp.asarray(stamp, jnp.float32))

    is_kf = (state.kf_accum >= spec.keyframe_gap) & (
        state.db.count < state.db.poses.shape[0])
    state = jax.lax.cond(
        is_kf,
        lambda s: _add_keyframe_branch(s, filt, pose, stamp, gps_alt,
                                       gps_valid, spec),
        lambda s: s,
        state,
    )

    row = jnp.concatenate([
        pose,
        jnp.stack([out.iterations.astype(jnp.float32), out.fitness,
                   out.matched_frac, is_kf.astype(jnp.float32),
                   jnp.asarray(stamp, jnp.float32)]),
        state.diag,
    ])
    slot = state.scan_count % spec.log_capacity
    return state._replace(
        log=state.log.at[slot].set(row),
        scan_count=state.scan_count + 1,
    )


@functools.partial(jax.jit, static_argnames=("spec",),
                   donate_argnames=("state",))
def device_chunk_step(state: DevState, clouds: Cloud, stamps, gps_alts,
                      gps_valids, scan_valids, spec: DevSpec,
                      wins: GuessWindows | None = None) -> DevState:
    """A CHUNK of full SLAM iterations in one device program: `lax.scan` of
    `device_step`'s body over the leading axis of a staged Cloud batch
    (io/prefetch.DeviceChunkPrefetcher) — one h2d transfer + one dispatch per
    chunk. `scan_valids` masks empty trailing slots of a short final chunk
    (those scans are skipped entirely)."""
    return _chunk_body(state, clouds, stamps, gps_alts, gps_valids,
                       scan_valids, spec, wins)


def raw_state(spec: DevSpec, cloud0: Cloud, cfg: SlamConfig) -> DevState:
    """Fresh engine state with odometry seeded from the first scan, before
    keyframe 0 is stored (no collectives — safe to build outside a mesh)."""
    filt = filter_scan(cloud0, spec.fcfg)
    odom0 = odometry.init_state(spec.ospec, jnp.zeros(6, jnp.float32),
                                filt.xyz, filt.mask)
    db = empty_db(cfg, spec.kf_points)
    graph = pg.empty_graph(spec.gspec)
    return DevState(
        odom=odom0,
        db=db,
        graph=graph,
        kf_accum=jnp.float32(0.0),
        travel=jnp.float32(0.0),
        last_kf_odom=jnp.zeros(6, jnp.float32),
        loop_count=jnp.int32(0),
        scan_count=jnp.int32(0),
        imu_vel=jnp.zeros(3, jnp.float32),
        last_stamp=jnp.float32(0.0),
        log=jnp.zeros((spec.log_capacity, 16), jnp.float32),
        diag=jnp.asarray(_DIAG_RESET),
    )


def init_state(spec: DevSpec, cloud0: Cloud, stamp0, cfg: SlamConfig) -> DevState:
    """Seed odometry with the first scan and store keyframe 0 (the host
    pipeline's first-scan path)."""
    state = raw_state(spec, cloud0, cfg)
    return _seed_first_kf(state, cloud0, jnp.float32(stamp0), spec)


def _seed_body(state: DevState, cloud0: Cloud, stamp0,
               spec: DevSpec) -> DevState:
    filt = filter_scan(cloud0, spec.fcfg)
    pose0 = jnp.zeros(6, jnp.float32)
    state = _add_keyframe_branch(state, filt, pose0, stamp0,
                                 jnp.float32(0.0), jnp.bool_(False), spec)
    row = jnp.concatenate(
        [pose0, jnp.array([0.0, 0.0, 1.0, 1.0], jnp.float32),
         jnp.asarray(stamp0, jnp.float32)[None], jnp.asarray(_DIAG_RESET)])
    return state._replace(log=state.log.at[0].set(row),
                          scan_count=jnp.int32(1),
                          last_stamp=jnp.asarray(stamp0, jnp.float32))


@functools.partial(jax.jit, static_argnames=("spec",),
                   donate_argnames=("state",))
def _seed_first_kf(state: DevState, cloud0: Cloud, stamp0,
                   spec: DevSpec) -> DevState:
    return _seed_body(state, cloud0, stamp0, spec)


def _chunk_body(state: DevState, clouds: Cloud, stamps, gps_alts,
                gps_valids, scan_valids, spec: DevSpec,
                wins: GuessWindows | None = None) -> DevState:
    def body(st, xs):
        if wins is None:
            (cloud, stamp, alt, gv, valid), w = xs, None
        else:
            cloud, stamp, alt, gv, valid, w = xs
        st = jax.lax.cond(
            valid,
            lambda s: _device_step_body(s, cloud, stamp, alt, gv, spec, w),
            lambda s: s, st)
        return st, None

    xs = (clouds, stamps, gps_alts, gps_valids, scan_valids)
    if wins is not None:
        xs = xs + (wins,)
    state, _ = jax.lax.scan(body, state, xs)
    return state


def make_mesh_fns(mesh, spec: DevSpec):
    """jit-compiled SPMD step/chunk/seed functions: the SAME `_device_step_body`
    the single-device engine runs, wrapped in a replicated-input `shard_map`
    over `mesh`. State and scans arrive replicated (in_specs P()); the ops
    shard their own compute internally via `spec.axis` (NDT points, SC/ISC DB
    slices, ICP correspondences, pose-graph factors) and reduce with
    deterministic all-gather-sums. This is the runnable multi-chip engine —
    `__graft_entry__.dryrun_multichip` compiles and runs this exact path.

    TPU-native replacement for the reference's whole concurrency fabric
    (pgo threads `pgo_node.cpp:12-14` + OMP reduction `ndt_omp_impl.hpp:
    187-280`): one SPMD program, collectives over ICI instead of shared
    memory."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax trees
        from jax.experimental.shard_map import shard_map

    assert spec.axis == mesh.axis_names[0]
    rep = P()
    ext = 1 if (spec.use_imu or spec.use_odom) else 0

    if ext:
        def step_body(state, cloud, stamp, gps_alt, gps_valid, win):
            return _device_step_body(state, cloud, stamp, gps_alt, gps_valid,
                                     spec, win)

        def chunk_body(state, clouds, stamps, alts, gvs, valids, wins):
            return _chunk_body(state, clouds, stamps, alts, gvs, valids,
                               spec, wins)
    else:
        step_body = functools.partial(_device_step_body, spec=spec)
        chunk_body = functools.partial(_chunk_body, spec=spec)

    step = jax.jit(shard_map(
        step_body, mesh=mesh,
        in_specs=(rep,) * (5 + ext), out_specs=rep, check_vma=False),
        donate_argnums=0)
    chunk = jax.jit(shard_map(
        chunk_body, mesh=mesh,
        in_specs=(rep,) * (6 + ext), out_specs=rep,
        check_vma=False),
        donate_argnums=0)
    seed = jax.jit(shard_map(
        functools.partial(_seed_body, spec=spec), mesh=mesh,
        in_specs=(rep, rep, rep), out_specs=rep, check_vma=False),
        donate_argnums=0)
    return step, chunk, seed


class DeviceSlamPipeline:
    """Host shell around `device_step`: feed clouds, read results at the end.

    Drop-in alternative to `SlamPipeline` for throughput-critical runs; after
    `finalize()` it exposes the same `.db/.graph/.loop_count/.kf_count/
    .odom_log/.loops` surface that `io/export.save_run` consumes."""

    def __init__(self, cfg: SlamConfig, kf_points: int = 4096,
                 log_capacity: int = 8192, sync_every: int = 4,
                 mesh=None):
        """With `mesh` (a 1-axis `jax.sharding.Mesh`), the engine runs as ONE
        SPMD program over the mesh: state replicated, hot-op compute sharded
        (see `make_mesh_fns`). Capacities must divide the mesh size."""
        self.cfg = cfg
        self.mesh = mesh
        axis = mesh.axis_names[0] if mesh is not None else None
        self.spec = spec_from_config(cfg, kf_points, log_capacity, axis=axis)
        if mesh is not None:
            D = mesh.devices.size
            for name, val in (("filter.max_points", cfg.filter.max_points),
                              ("kf_points", kf_points),
                              ("pgo.max_keyframes", cfg.pgo.max_keyframes),
                              ("pgo.max_loops", cfg.pgo.max_loops)):
                if val % D != 0:
                    raise ValueError(
                        f"{name} ({val}) must be divisible by the mesh size "
                        f"({D}) for sharded compute")
            self._mesh_step, self._mesh_chunk, self._mesh_seed = \
                make_mesh_fns(mesh, self.spec)
            from jax.sharding import NamedSharding, PartitionSpec
            self._replicate = functools.partial(
                jax.device_put, device=NamedSharding(mesh, PartitionSpec()))
        else:
            self._replicate = lambda x: x
        # drain the device queue every N chunks: a shallow async backlog
        # keeps the relay's first-readback stall at ~10 s instead of
        # 8-20 MINUTES after thousands of undrained dispatches (measured;
        # PERF.md "relay pathologies"). block_until_ready is not a readback.
        self.sync_every = sync_every
        self._chunks_fed = 0
        # sub-spec aliases for API parity with SlamPipeline (io/export reads
        # pipe.gspec for g2o information matrices)
        self.gspec = self.spec.gspec
        self.scspec = self.spec.scspec
        self.iscspec = self.spec.iscspec
        self.icpspec = self.spec.icpspec
        self.ospec = self.spec.ospec
        self.kf_points = kf_points
        self.state: DevState | None = None
        # log-wrap protection: the device log is a ring of log_capacity rows
        # (device_step writes slot = scan_count % capacity). Rather than
        # silently losing the earliest rows on runs longer than the capacity
        # (round-1 bug), the host archives the buffer BEFORE a feed would
        # overwrite un-archived rows. The archive readback costs relay
        # throughput (PERF.md "post-readback mode"), so size log_capacity to
        # the run length to avoid it — this path is the correctness net.
        self._scans_fed = 0
        self._archived = 0
        self._log_archive: list[np.ndarray] = []
        self._warned_wrap = False
        # filled by finalize()
        self.db = None
        self.graph = None
        self.loop_count = 0
        self.kf_count = 0
        self.scan_count = 0
        self.odom_log: list[dict] = []
        self.loops: list = []

    def process_scan(self, cloud: Cloud, intensity=None, stamp: float = 0.0,
                     gps_alt: float | None = None,
                     imu=None, wheel=None) -> None:
        """Feed one device-staged Cloud (io/prefetch.py). No readbacks.

        `imu` / `wheel` (ops.imu.ImuWindow / OdomWindow) carry inter-scan
        sensor samples; with cfg.odom.use_imu/use_odom they are integrated ON
        DEVICE into the NDT guess (reference use_imu/use_odom modes)."""
        if not isinstance(cloud, Cloud):
            from xchu_slam_tpu.types import make_cloud
            cloud = make_cloud(cloud, intensity,
                               capacity=self.cfg.filter.max_raw_points)
        if self.state is None:
            self.state = self._init_state(cloud, stamp)
            self._scans_fed = 1
            return
        self._reserve_log(1)
        use_ext = self.spec.use_imu or self.spec.use_odom
        win = GuessWindows(imu=imu, wheel=wheel) if use_ext else None
        # EVERYTHING traced is replicated (scalars included): on a
        # multi-process mesh, a bare local jnp scalar mixed with global
        # arrays is an error — and on a single-process mesh the device_put
        # is free
        args = self._replicate((cloud, jnp.float32(stamp),
                                jnp.float32(gps_alt if gps_alt is not None
                                            else 0.0),
                                jnp.bool_(gps_alt is not None)))
        if self.mesh is not None:
            if use_ext:
                self.state = self._mesh_step(self.state, *args,
                                             self._replicate(win))
            else:
                self.state = self._mesh_step(self.state, *args)
        else:
            self.state = device_step(self.state, *args, self.spec, win)
        self._scans_fed += 1

    def _init_state(self, cloud: Cloud, stamp: float) -> DevState:
        if self.mesh is None:
            return init_state(self.spec, cloud, stamp, self.cfg)
        state = self._replicate(raw_state(self.spec, cloud, self.cfg))
        cloud_r, stamp_r = self._replicate((cloud, jnp.float32(stamp)))
        return self._mesh_seed(state, cloud_r, stamp_r)

    def process_chunk(self, clouds: Cloud, stamps, n_real: int,
                      gps_alts=None, wins: GuessWindows | None = None) -> None:
        """Feed a staged chunk (Cloud batch [chunk,...] from
        io/prefetch.DeviceChunkPrefetcher): one dispatch for `chunk` scans.
        `stamps` is per-slot [chunk]; `n_real` ≤ chunk marks how many slots
        hold real scans (a short final chunk). `wins` (GuessWindows with a
        leading [chunk] axis on every leaf) feeds the IMU / wheel-odom guess
        when cfg.odom.use_imu/use_odom is set."""
        chunk = clouds.xyz.shape[0]
        stamps = np.asarray(stamps, np.float32)
        if gps_alts is None:
            alts = np.zeros((chunk,), np.float32)
            gvalid = np.zeros((chunk,), bool)
        else:
            alts = np.nan_to_num(np.asarray(gps_alts, np.float32))
            gvalid = np.isfinite(np.asarray(gps_alts, np.float32))
        if chunk > self.spec.log_capacity:
            raise ValueError(
                f"chunk ({chunk}) exceeds log_capacity "
                f"({self.spec.log_capacity}): rows would be lost mid-dispatch")
        valid = np.arange(chunk) < n_real
        if self.state is None:
            first = jax.tree.map(lambda a: a[0], clouds)
            self.state = self._init_state(first, float(stamps[0]))
            valid = valid.copy()
            valid[0] = False
        else:
            self._reserve_log(int(n_real))
        use_ext = self.spec.use_imu or self.spec.use_odom
        if not use_ext:
            wins = None
        args = self._replicate((clouds, jnp.asarray(stamps),
                                jnp.asarray(alts), jnp.asarray(gvalid),
                                jnp.asarray(valid)))
        if self.mesh is not None:
            if use_ext:
                self.state = self._mesh_chunk(self.state, *args,
                                              self._replicate(wins))
            else:
                self.state = self._mesh_chunk(self.state, *args)
        else:
            self.state = device_chunk_step(self.state, *args, self.spec, wins)
        self._scans_fed += int(n_real)
        self._chunks_fed += 1
        if self.sync_every and self._chunks_fed % self.sync_every == 0:
            jax.block_until_ready(self.state.log)

    def _reserve_log(self, n_new: int) -> None:
        """Archive device log rows to host before a feed of `n_new` scans
        would overwrite rows not yet archived (ring wrap)."""
        cap = self.spec.log_capacity
        if self._scans_fed + n_new - self._archived <= cap:
            return
        if not self._warned_wrap:
            import warnings
            warnings.warn(
                f"device log capacity ({cap}) is smaller than the run; "
                f"archiving rows to host mid-run (costs a device readback — "
                f"set log_capacity >= the expected scan count to avoid)",
                RuntimeWarning, stacklevel=3)
            self._warned_wrap = True
        log = _fetch(self.state.log)
        self._log_archive.extend(
            log[t % cap] for t in range(self._archived, self._scans_fed))
        self._archived = self._scans_fed

    def finalize(self) -> None:
        """Final pose-graph solve + ONE compact host readback.

        Reads back only the small fields (counters, log, loop table) — NOT
        the keyframe clouds/descriptor DBs (~150 MB), which stay on device;
        export pulls the clouds once, in bulk, inside `assemble_map`."""
        import sys
        import time

        st = self.state
        t0 = time.perf_counter()
        opt = pg.solve(st.db.opt_poses, st.graph, self.spec.gspec)
        jax.block_until_ready(opt)
        t1 = time.perf_counter()
        st = st._replace(db=st.db._replace(opt_poses=opt))
        self.state = st
        host = jax.tree.map(_fetch, {
            "count": st.db.count, "loop_count": st.loop_count,
            "scan_count": st.scan_count, "log": st.log,
            "loop_i": st.graph.loop_i, "loop_j": st.graph.loop_j,
            "loop_info": st.graph.loop_info,
        })
        print(f"finalize: solve {t1-t0:.1f}s, readback "
              f"{time.perf_counter()-t1:.1f}s", file=sys.stderr)
        self.db = st.db  # device arrays (export reads via np.asarray)
        self.graph = st.graph
        self.kf_count = int(host["count"])
        self.loop_count = int(host["loop_count"])
        self.scan_count = int(host["scan_count"])
        from xchu_slam_tpu.models.pipeline import LoopRecord
        cap = self.spec.log_capacity
        tail = [host["log"][t % cap]
                for t in range(self._archived, self.scan_count)]
        log = np.asarray(self._log_archive + tail)
        n = len(log)
        self.odom_log = [
            {"stamp": float(log[i, 10]), "pose": log[i, :6],
             "iterations": int(log[i, 6]), "fitness": float(log[i, 7]),
             "matched_frac": float(log[i, 8]),
             "keyframe": bool(log[i, 9] > 0.5),
             # loop diagnostics — the reference's accept/reject console logs
             # (pgo_node.cpp:444-447) as data
             "loop_cand": int(log[i, 11]),
             "loop_found": bool(log[i, 12] > 0.5),
             "loop_icp_fitness": float(log[i, 13]),
             "loop_icp_correction": float(log[i, 14]),
             "loop_verify_ran": bool(log[i, 15] > 0.5)}
            for i in range(n)
        ]
        self.loops = [
            LoopRecord(i=int(host["loop_i"][q]),
                       j=int(host["loop_j"][q]),
                       fitness=float(1.0 / max(host["loop_info"][q], 1e-9)),
                       method=self.spec.method)
            for q in range(self.loop_count)
        ]

    def keyframe_trajectory(self):
        n = self.kf_count
        return (_fetch(self.db.stamps)[:n],
                _fetch(self.db.poses)[:n],
                _fetch(self.db.opt_poses)[:n])

    def odometry_trajectory(self) -> np.ndarray:
        return np.array([r["pose"] for r in self.odom_log], np.float32)

    def assemble_map(self, voxel: float = 0.5, max_points: int = 1 << 20):
        from xchu_slam_tpu.models.pipeline import SlamPipeline
        return SlamPipeline.assemble_map(self, voxel, max_points)
