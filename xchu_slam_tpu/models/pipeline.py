"""Full SLAM pipeline: filter → odometry → keyframes → loop closure → PGO.

Host-orchestrated replacement for the reference's three ROS processes
(`filter_node` → `odom_node` → `pgo_node`, SURVEY.md §1) and pgo's four
threads (`Run`/`LoopClosure`/`ICPRefine`/`MapVisualization`,
`pgo_node.cpp:12-14`). Every compute stage is a jit-compiled device program
over fixed-shape state; the host loop only moves scalars and orchestrates —
there are no topic queues and no mutexes, state flows functionally.

Key behavioral parity points:
- keyframe gating every `keyframe_gap` m of odometric travel
  (`pgo_node.cpp:188-205`)
- descriptors on the filtered cloud (`pgo_node.cpp:234-247`)
- loop methods: radius search / Scan Context / ISC (`pgo_node.cpp:299-388`)
- ICP verification of ±`submap_half_width` keyframe submaps at the current
  *optimized* poses, accept fitness ≤ thresh (`pgo_node.cpp:404-483`)
- pose-graph solve rewrites all keyframe poses (`ISAM2Update`,
  `pgo_node.cpp:498-528`); between solves, new keyframes chain onto the last
  optimized pose exactly as iSAM2 would with odometry-only factors.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.config import SlamConfig
from xchu_slam_tpu.models import odometry, pose_graph as pg
from xchu_slam_tpu.ops import icp, isc as isc_ops, ndt, scancontext as sc, voxel_map as vm
from xchu_slam_tpu.ops.filter import filter_scan
from xchu_slam_tpu.types import Cloud, make_cloud
from xchu_slam_tpu.utils import se3

# pose-matrix products must not drop to bf16 on the TPU MXU: at ±hundreds of
# metres of translation that is decimetre-scale error PER COMPOSE (this bit:
# plain matmul silently corrupted every between-factor on hardware while CPU
# tests stayed exact)
_PREC = jax.lax.Precision.HIGHEST


class KfDb(NamedTuple):
    """Fixed-capacity keyframe database (device arrays)."""

    poses: jnp.ndarray       # [K,6] odometry poses
    opt_poses: jnp.ndarray   # [K,6] optimized poses (rewritten on PGO solve)
    stamps: jnp.ndarray      # [K]
    travel: jnp.ndarray      # [K] cumulative odometric travel
    clouds: jnp.ndarray      # [K,P,3] body-frame keyframe clouds
    cloud_mask: jnp.ndarray  # [K,P]
    sc_db: jnp.ndarray       # [K,R,S]
    isc_db: jnp.ndarray      # [K,Ri,Si]
    count: jnp.ndarray       # int32


def empty_db(cfg: SlamConfig, kf_points: int) -> KfDb:
    K = cfg.pgo.max_keyframes
    return KfDb(
        poses=jnp.zeros((K, 6), jnp.float32),
        opt_poses=jnp.zeros((K, 6), jnp.float32),
        stamps=jnp.zeros((K,), jnp.float32),
        travel=jnp.zeros((K,), jnp.float32),
        clouds=jnp.zeros((K, kf_points, 3), jnp.float32),
        cloud_mask=jnp.zeros((K, kf_points), bool),
        sc_db=jnp.zeros((K, cfg.sc.num_ring, cfg.sc.num_sector), jnp.float32),
        isc_db=jnp.zeros((K, cfg.isc.num_ring, cfg.isc.num_sector), jnp.float32),
        count=jnp.int32(0),
    )


@functools.partial(jax.jit, static_argnames=("fcfg", "ospec"),
                   donate_argnames=("state",))
def fused_filter_step(state, cloud: Cloud, fcfg, ospec,
                      ext_delta=None, use_ext=False):
    """Filter + odometry step as ONE device program per scan — a single
    dispatch over the host↔device link instead of two (the per-scan hot
    path; the reference's filter_node→odom_node topic hop collapses into an
    XLA-fused pipeline stage). `ext_delta`/`use_ext` feed an IMU / wheel-odom
    initial guess (reference use_imu/use_odom, odom_node.cpp:237-254)."""
    filt = filter_scan(cloud, fcfg)
    new_state, out = odometry.step(state, filt.xyz, filt.mask, ospec,
                                   ext_delta, use_ext)
    return new_state, out, filt


@functools.partial(jax.jit, static_argnames=("n_out",))
def subsample_cloud(xyz, mask, n_out: int):
    """Spatially unbiased fixed-size subsample: compact valid points then take
    an even stride. Returns (xyz [n_out,3], mask [n_out], src_idx [n_out]).

    Compaction is cumsum + scatter (one O(N) pass, bit-exact vs the stable
    argsort it replaces — sorts are among the slowest TPU primitives); the
    strided indices land on compacted slots < n_valid, which are valid by
    construction."""
    N = xyz.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask, pos, N)
    xyz_c = jnp.zeros((N + 1, 3), xyz.dtype).at[dest].set(xyz)[:N]
    src_c = jnp.zeros((N + 1,), jnp.int32).at[dest].set(jnp.arange(N))[:N]
    n_valid = jnp.sum(mask)
    idx = (jnp.arange(n_out) * jnp.maximum(n_valid, 1)) // n_out
    idx = jnp.clip(idx, 0, N - 1)
    take_mask = jnp.arange(n_out) < jnp.minimum(n_valid, n_out)
    src_idx = src_c[idx]
    return (jnp.where(take_mask[:, None], xyz_c[idx], 0.0),
            take_mask, src_idx)


# NOTE: db is deliberately NOT donated — the async loop worker may hold a
# snapshot of these arrays (HBM copies are cheap; invalidated buffers are not)
@jax.jit
def _transform_all_clouds(poses6, clouds):
    """Batched keyframe-cloud → map-frame transform (vmap over keyframes)."""
    T = se3.pose_to_matrix(poses6)
    return jax.vmap(se3.transform_points)(T, clouds)


@jax.jit
def _add_keyframe(db: KfDb, pose6, stamp, travel, cloud_xyz, cloud_mask,
                  sc_desc, isc_desc, opt_pose6):
    k = db.count
    return db._replace(
        poses=db.poses.at[k].set(pose6),
        opt_poses=db.opt_poses.at[k].set(opt_pose6),
        stamps=db.stamps.at[k].set(stamp),
        travel=db.travel.at[k].set(travel),
        clouds=db.clouds.at[k].set(cloud_xyz),
        cloud_mask=db.cloud_mask.at[k].set(cloud_mask),
        sc_db=db.sc_db.at[k].set(sc_desc),
        isc_db=db.isc_db.at[k].set(isc_desc),
        count=k + 1,
    )


@functools.partial(jax.jit, static_argnames=("half_width", "out_n"))
def build_submap(db: KfDb, centre_idx, frame_idx, half_width: int, out_n: int):
    """±half_width keyframe clouds at optimized poses, expressed in
    keyframe `frame_idx`'s frame (LoopFindNearKeyframesCloud analogue)."""
    K = db.poses.shape[0]
    ks = centre_idx + jnp.arange(-half_width, half_width + 1)
    ok = (ks >= 0) & (ks < db.count)
    ksc = jnp.clip(ks, 0, K - 1)
    T_w = se3.pose_to_matrix(db.opt_poses[ksc])            # [W,4,4]
    T_i_inv = se3.inverse(se3.pose_to_matrix(db.opt_poses[frame_idx]))
    T_rel = jnp.einsum("ab,wbc->wac", T_i_inv, T_w, precision=_PREC)
    pts = se3.transform_points(T_rel, db.clouds[ksc])       # [W,P,3]
    mask = db.cloud_mask[ksc] & ok[:, None]
    flat_pts = pts.reshape(-1, 3)
    flat_mask = mask.reshape(-1)
    return subsample_cloud(flat_pts, flat_mask, out_n)


@functools.partial(jax.jit, static_argnames=())
def _radius_candidate(db: KfDb, cur_idx, cur_stamp, radius, min_time):
    """Loop method 0 (reference pgo_node.cpp:299-342): nearest keyframe within
    `radius` metres (2-D) that is at least `min_time` seconds older.

    Searches OPTIMIZED poses — the reference's kd-tree is built over
    `keyframePosesUpdated` (pgo_node.cpp:303-342), so after a big loop
    correction retrieval follows the corrected trajectory; the device engine
    (`device_pipeline._sc_radius_candidate`) does the same."""
    K = db.poses.shape[0]
    pos = db.opt_poses[cur_idx, :2]
    d = jnp.linalg.norm(db.opt_poses[:, :2] - pos[None], axis=-1)
    eligible = (jnp.arange(K) < db.count) & (db.stamps < cur_stamp - min_time)
    d = jnp.where(eligible, d, jnp.inf)
    best = jnp.argmin(d)
    found = d[best] < radius
    return jnp.where(found, best, -1).astype(jnp.int32), found


class LoopRecord(NamedTuple):
    i: int
    j: int
    fitness: float
    method: str


class SlamPipeline:
    """End-to-end SLAM engine instance. Feed scans; read trajectories."""

    def __init__(self, cfg: SlamConfig, kf_points: int = 4096):
        self.cfg = cfg
        self.ospec = odometry.spec_from_config(cfg)
        self.scspec = sc.spec_from_config(cfg.sc)
        self.iscspec = isc_ops.spec_from_config(cfg.isc)
        self.icpspec = icp.spec_from_config(cfg.loop)
        self.gspec = pg.spec_from_config(cfg.pgo)
        self.kf_points = kf_points

        self.db = empty_db(cfg, kf_points)
        self.graph = pg.empty_graph(self.gspec)
        self.odom_state = None
        self.loop_count = 0
        self.loops: list[LoopRecord] = []
        self.scan_count = 0
        self.kf_count = 0  # host mirror of db.count — avoids a device sync
        self.kf_gate_accum = 0.0
        self.travel = 0.0
        self._last_odom_pose = None
        self._last_stamp = None
        self._last_kf_odom = None
        self._dirty_graph = False
        self._worker = None
        if cfg.loop.async_detect:
            from xchu_slam_tpu.models.async_worker import AsyncLoopWorker
            self._worker = AsyncLoopWorker(self)
        # deferred-sync mode: process scan k's host-side bookkeeping while the
        # device computes scan k+1 (one-scan pipelining; results identical,
        # just delivered one call later)
        self.defer_sync = False
        self._pending = None
        # IMU / wheel-odometry guess state (reference use_imu/use_odom modes,
        # odom_node.cpp:237-254): velocity estimate carried between scans
        from xchu_slam_tpu.ops import imu as imu_ops
        self._imu_state = imu_ops.ImuState(velocity=jnp.zeros(3, jnp.float32))
        # diagnostics
        self.odom_log: list[dict] = []

    def _ext_guess(self, imu, wheel):
        """Integrate the per-scan IMU / wheel windows into an ext_delta for
        the NDT guess, per the configured mode (ImuCalc / OdomCalc /
        ImuOdomCalc — odom_node.cpp:494-663). Returns (delta6|None, use)."""
        from xchu_slam_tpu.ops import imu as imu_ops

        cfg = self.cfg.odom
        pose0 = self.odom_state.pose
        d_imu = d_wheel = None
        if cfg.use_imu and imu is not None:
            d_imu, self._imu_state = imu_ops.integrate_imu(
                imu, pose0, self._imu_state)
        if cfg.use_odom and wheel is not None:
            d_wheel = imu_ops.integrate_wheel_odom(wheel, pose0)
        if d_imu is not None and d_wheel is not None:
            return imu_ops.combine_imu_odom(d_imu, d_wheel), True
        if d_imu is not None:
            return d_imu, True
        if d_wheel is not None:
            return d_wheel, True
        return None, False

    # ------------------------------------------------------------------ #
    def process_scan(self, xyz: np.ndarray | Cloud,
                     intensity: np.ndarray | None,
                     stamp: float, gps_alt: float | None = None,
                     imu=None, wheel=None) -> dict | None:
        """Feed one scan. `xyz` may be raw numpy points or an already
        device-staged Cloud (io.prefetch.DeviceScanPrefetcher) — the streaming
        path that overlaps host→device transfer with compute.

        `imu` (ops.imu.ImuWindow) / `wheel` (ops.imu.OdomWindow) carry the
        inter-scan sensor samples since the previous scan; with
        cfg.odom.use_imu/use_odom they replace the constant-velocity NDT
        guess (reference odom_node.cpp:237-254, 494-663)."""
        cfg = self.cfg
        if isinstance(xyz, Cloud):
            cloud = xyz
        else:
            cloud = make_cloud(xyz, intensity,
                               capacity=cfg.filter.max_raw_points)

        if self.odom_state is None:
            filt = filter_scan(cloud, cfg.filter)
            init = jnp.zeros(6, jnp.float32)
            self.odom_state = odometry.init_state(self.ospec, init, filt.xyz, filt.mask)
            pose = np.zeros(6, np.float32)
            self._last_odom_pose = pose
            self._last_stamp = float(stamp)
            self._add_kf(pose, stamp, filt, opt_pose=pose, gps_alt=gps_alt)
            self.scan_count += 1
            return {"pose": pose, "keyframe": True, "loop": None,
                    "ground": self._maybe_ground(filt)}

        result = None
        if self.defer_sync and cfg.odom.use_imu and self._pending is not None:
            # with IMU guessing, consume the pending scan BEFORE integrating
            # the new guess: _consume performs the per-scan velocity reset
            # (odom_node.cpp:312-317) that _ext_guess must see — otherwise the
            # guess for scan k+1 integrates from the pre-reset velocity and
            # defer_sync results diverge from synchronous mode. The previous
            # scan was dispatched a full call ago, so this readback does not
            # stall the device pipeline meaningfully.
            result = self._consume(*self._pending)
            self._pending = None
        ext_delta, use_ext = self._ext_guess(imu, wheel)
        self.odom_state, out, filt = fused_filter_step(
            self.odom_state, cloud, cfg.filter, self.ospec,
            ext_delta, use_ext)
        if self.defer_sync:
            # dispatch done (async); consume the PREVIOUS scan's results so
            # the host never blocks on the scan just submitted
            if self._pending is not None:
                result = self._consume(*self._pending)
            self._pending = (out, filt, stamp, gps_alt)
            return result
        return self._consume(out, filt, stamp, gps_alt)

    def _consume(self, out, filt, stamp, gps_alt) -> dict:
        cfg = self.cfg
        ground_res = self._maybe_ground(filt)
        # ONE batched device→host fetch per scan (each np.asarray/int/float on
        # a device scalar is a separate round trip over the host↔TPU link)
        pose, iters, mfrac, fit = jax.device_get(
            (out.pose, out.iterations, out.matched_frac, out.fitness))
        prev_pose = self._last_odom_pose
        step_d = float(np.linalg.norm(pose[:2] - prev_pose[:2]))
        self.travel += step_d
        self.kf_gate_accum += step_d
        self._last_odom_pose = pose
        self.scan_count += 1
        if cfg.odom.use_imu and self._last_stamp is not None:
            # reset the IMU velocity from the SLAM result every scan
            # (reference odom_node.cpp:312-317): pure double integration is a
            # velocity random walk that degrades below constant-velocity.
            # _last_stamp (seeded at scan 0, like the device engine's
            # last_stamp) covers the FIRST inter-scan interval too.
            from xchu_slam_tpu.ops import imu as imu_ops
            dt = float(stamp) - self._last_stamp
            if dt > 1e-6:
                self._imu_state = imu_ops.ImuState(
                    velocity=jnp.asarray((pose[:3] - prev_pose[:3]) / dt,
                                         jnp.float32))
        self._last_stamp = float(stamp)
        self.odom_log.append({
            "stamp": stamp,
            "pose": pose,
            "iterations": int(iters),
            "matched_frac": float(mfrac),
            "fitness": float(fit),
        })

        is_kf = (self.kf_gate_accum >= cfg.pgo.keyframe_gap
                 and self.kf_count < cfg.pgo.max_keyframes)
        loop_rec = None
        if is_kf:
            self.kf_gate_accum = 0.0
            opt_pose = self._chain_opt_pose(pose)
            self._add_kf(pose, stamp, filt, opt_pose=opt_pose, gps_alt=gps_alt)
            k = self.kf_count - 1
            if k >= 1 and k % cfg.loop.detect_period == 0:
                if self._worker is not None:
                    self._worker.submit(k, stamp)
                else:
                    loop_rec = self._detect_and_verify(k, stamp)
        # apply asynchronously verified loops at scan boundaries
        if self._worker is not None:
            for v in self._worker.drain():
                if self._apply_loop(v) is not None:
                    loop_rec = self.loops[-1]
        return {"pose": pose, "keyframe": is_kf, "loop": loop_rec,
                "ground": ground_res}

    def _maybe_ground(self, filt: Cloud):
        if not self.cfg.filter.detect_ground:
            return None
        from xchu_slam_tpu.ops import ground as ground_ops
        return ground_ops.detect_plane(
            filt.xyz, filt.mask, ground_ops.spec_from_config(self.cfg.ground))

    # ------------------------------------------------------------------ #
    def _chain_opt_pose(self, odom_pose: np.ndarray) -> np.ndarray:
        """New keyframe's optimized pose = previous optimized ∘ odometric delta
        (what iSAM2 yields for a chain extension)."""
        if self._last_kf_odom is None:
            return odom_pose
        k = self.kf_count - 1
        T_prev_opt = se3.pose_to_matrix(self.db.opt_poses[k])
        Z = jnp.matmul(
            se3.inverse(se3.pose_to_matrix(jnp.asarray(self._last_kf_odom))),
            se3.pose_to_matrix(jnp.asarray(odom_pose)),
            precision=_PREC,
        )
        return np.asarray(se3.matrix_to_pose(
            jnp.matmul(T_prev_opt, Z, precision=_PREC)))

    def _add_kf(self, pose, stamp, filt: Cloud, opt_pose, gps_alt=None):
        cxyz, cmask, src_idx = subsample_cloud(filt.xyz, filt.mask, self.kf_points)
        # descriptors come from the FULL filtered cloud — the reference makes
        # SC/ISC from /filtered_points directly (pgo_node.cpp:234-247); the
        # kf_points subsample exists only to bound the stored submap clouds.
        # Subsampled descriptors measurably inflate SC distances (sparser
        # max-height images) and miss revisits.
        sc_desc = sc.make_descriptor(filt.xyz, filt.mask, self.scspec)
        if self.cfg.loop.method == "isc":
            isc_desc = isc_ops.make_descriptor(filt.xyz, filt.intensity,
                                               filt.mask, self.iscspec)
        else:
            isc_desc = jnp.zeros(
                (self.cfg.isc.num_ring, self.cfg.isc.num_sector), jnp.float32)
        self.db = _add_keyframe(
            self.db, jnp.asarray(pose, jnp.float32), jnp.float32(stamp),
            jnp.float32(self.travel), cxyz, cmask, sc_desc, isc_desc,
            jnp.asarray(opt_pose, jnp.float32),
        )
        self.kf_count += 1
        k = self.kf_count - 1
        if k >= 1:
            Z = jnp.matmul(
                se3.inverse(se3.pose_to_matrix(jnp.asarray(self._last_kf_odom))),
                se3.pose_to_matrix(jnp.asarray(pose, jnp.float32)),
                precision=_PREC,
            )
            self.graph = self.graph._replace(
                between_T=self.graph.between_T.at[k].set(Z),
                kf_mask=self.graph.kf_mask.at[k].set(True),
            )
        else:
            self.graph = self.graph._replace(
                kf_mask=self.graph.kf_mask.at[0].set(True))
        if gps_alt is not None and self.cfg.pgo.use_gps:
            self.graph = self.graph._replace(
                gps_alt=self.graph.gps_alt.at[k].set(gps_alt),
                gps_mask=self.graph.gps_mask.at[k].set(True),
            )
        self._last_kf_odom = np.asarray(pose, np.float32)

    # ------------------------------------------------------------------ #
    def detect_and_verify_snapshot(self, k: int, stamp: float):
        """Pure detection + ICP verification against the CURRENT immutable
        database snapshot. Mutates nothing — safe to call from the async
        worker thread; the pipeline thread applies the result."""
        cfg = self.cfg
        db = self.db  # atomic snapshot (arrays are immutable)
        method = cfg.loop.method
        cand = -1
        yaw = None  # descriptor-measured relative yaw (ψ_cand − ψ_query)
        if method == "sc":
            # cur=k: the async worker may run this AFTER newer keyframes were
            # appended, so gating must be relative to the query frame
            res = sc.detect_loop(db.sc_db[k], db.sc_db, db.count, self.scspec,
                                 cur=jnp.int32(k))
            if bool(res.found):
                cand = int(res.idx)
                yaw = float(res.yaw)
        elif method == "isc":
            res = isc_ops.detect_loop(
                db.isc_db[k], db.isc_db, db.count,
                db.poses[:, :3], db.travel, self.iscspec, cur=jnp.int32(k))
            if bool(res.found):
                cand = int(res.idx)
                yaw = float(res.yaw)
        elif method == "radius":
            idx, found = _radius_candidate(
                db, jnp.int32(k), jnp.float32(stamp),
                cfg.loop.radius_search, cfg.loop.min_time_diff)
            if bool(found):
                cand = int(idx)
        if cand < 0:
            return None

        # 2-D sanity gate (reference pgo_node.cpp:335-338)
        d2 = float(np.linalg.norm(
            np.asarray(db.opt_poses[k, :2] - db.opt_poses[cand, :2])))
        if d2 > cfg.loop.max_loop_dist:
            return None

        # ICP verification: current kf cloud vs submap around candidate
        tgt_xyz, tgt_mask, _ = build_submap(db, jnp.int32(cand), jnp.int32(cand),
                                            cfg.loop.submap_half_width,
                                            cfg.loop.submap_points)
        T_init = jnp.matmul(
            se3.inverse(se3.pose_to_matrix(db.opt_poses[cand])),
            se3.pose_to_matrix(db.opt_poses[k]),
            precision=_PREC,
        )
        if cfg.loop.use_sc_yaw and yaw is not None:
            # descriptor yaw = ψ_cand − ψ_query, so the true relative heading
            # (query expressed in cand's frame) is −yaw; replace the drifted
            # estimate's heading with it (the reference discards this value,
            # pgo_node.cpp:344-363 — see LoopConfig.use_sc_yaw)
            p_init = se3.matrix_to_pose(T_init)
            T_init = se3.pose_to_matrix(p_init.at[5].set(-yaw))
        res = icp.align(db.clouds[k], db.cloud_mask[k],
                        tgt_xyz, tgt_mask, T_init, self.icpspec)
        fitness = float(res.fitness)
        # reference accepts only `icp.hasConverged() && fitness <= thresh`
        # (pgo_node.cpp:441-448): a verification that hits the iteration cap
        # while still moving must not become a loop factor
        if not (bool(res.converged) and fitness <= cfg.loop.icp_fitness_thresh):
            return None
        # divergence guard: the odometric guess bounds how far a genuine
        # correction can be (fitness alone scales with cloud density)
        corr = float(np.linalg.norm(np.asarray(res.T)[:3, 3]
                                    - np.asarray(T_init)[:3, 3]))
        if corr > cfg.loop.max_correction:
            return None
        from xchu_slam_tpu.models.async_worker import VerifiedLoop
        return VerifiedLoop(i=cand, j=k, T=res.T, fitness=fitness,
                            method=method)

    def _apply_loop(self, v) -> LoopRecord | None:
        """Apply a verified loop to the factor graph (pipeline thread only)."""
        if self.loop_count >= self.gspec.max_loops:
            return None
        q = self.loop_count
        self.graph = self.graph._replace(
            loop_i=self.graph.loop_i.at[q].set(v.i),
            loop_j=self.graph.loop_j.at[q].set(v.j),
            loop_T=self.graph.loop_T.at[q].set(v.T),
            loop_info=self.graph.loop_info.at[q].set(1.0 / max(v.fitness, 1e-2)),
            loop_mask=self.graph.loop_mask.at[q].set(True),
        )
        self.loop_count += 1
        rec = LoopRecord(i=v.i, j=v.j, fitness=v.fitness, method=v.method)
        self.loops.append(rec)
        self._dirty_graph = True
        # solve cadence checked PER APPLIED LOOP, matching the device engine's
        # `_verify_and_apply` (which evaluates solve_every inside the accept
        # branch) — not once per scan after applying all of a scan's loops
        self._solve_graph()
        return rec

    def _detect_and_verify(self, k: int, stamp: float):
        v = self.detect_and_verify_snapshot(k, stamp)
        if v is None:
            return None
        return self._apply_loop(v)

    def _solve_graph(self, full: bool = False):
        """`full=False` (in-run, per accepted loop) uses the warm-started
        inloop spec and honors the solve_every cadence; finalize passes
        full=True for the full-strength solve (matches the device engine)."""
        spec = self.gspec
        if not full:
            if spec.solve_every > 1 and self.loop_count % spec.solve_every:
                return  # cadence: leave opt poses until the next solve
            spec = pg.inloop_spec(spec)
        opt = pg.solve(self.db.opt_poses, self.graph, spec)
        self.db = self.db._replace(opt_poses=opt)
        self._dirty_graph = False

    # ------------------------------------------------------------------ #
    def finalize(self):
        """Final PGO solve (the reference's shutdown ISAM2Update + SaveMap
        trigger, pgo_node.cpp:487-495)."""
        if self._pending is not None:
            self._consume(*self._pending)
            self._pending = None
        if self._worker is not None:
            # stop FIRST (join waits for the in-flight verification to finish
            # and deposit its result), then drain — the other order loses the
            # final loop
            self._worker.stop()
            for v in self._worker.drain():
                self._apply_loop(v)
            self._worker = None
        if self._dirty_graph or self.loop_count > 0:
            self._solve_graph(full=True)

    def keyframe_trajectory(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(stamps, odometry poses6, optimized poses6) for live keyframes."""
        n = self.kf_count
        return (np.asarray(self.db.stamps[:n]),
                np.asarray(self.db.poses[:n]),
                np.asarray(self.db.opt_poses[:n]))

    def odometry_trajectory(self) -> np.ndarray:
        return np.array([r["pose"] for r in self.odom_log], np.float32)

    def assemble_map(self, voxel: float = 0.5, max_points: int = 1 << 20):
        """Aggregate keyframe clouds at optimized poses (SaveMap analogue).

        ONE device program transforms every keyframe cloud (batched over the
        full static capacity — the reference's OMP-parallel transform loop,
        pgo_node.cpp:576-618, as a vmap) and ONE bulk readback pulls the
        n real keyframes; per-keyframe host loops cost a dispatch + readback
        round-trip each on a remote-attached device (measured ~350 s for 551
        keyframes vs ~2 s for this path)."""
        n = self.kf_count
        if n == 0:
            return np.zeros((0, 3), np.float32)
        pts = _transform_all_clouds(self.db.opt_poses, self.db.clouds)
        allp = np.asarray(pts[:n])[np.asarray(self.db.cloud_mask[:n])]
        if voxel > 0 and len(allp):
            # exact voxel dedup via packed int64 key (21 bits/axis, ±1e6
            # voxel range) — ~8× faster than np.unique(axis=0) on multi-
            # million-point maps
            keys = np.floor(allp / voxel).astype(np.int64) + (1 << 20)
            flat = keys[:, 0] | (keys[:, 1] << 21) | (keys[:, 2] << 42)
            _, idx = np.unique(flat, return_index=True)
            allp = allp[idx]
        return allp[:max_points]
