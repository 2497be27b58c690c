"""Multi-session place recognition / relocalization against a saved session.

The reference ships multi-session Scan Context matching only as an uncalled
library capability (`SCManager::detectLoopClosureIDBetweenSession`,
`Scancontext.cpp:267-328` — no node invokes it). Here it is an end-to-end
feature: load a previous session's keyframe database (utils/checkpoint.py
serializes it), and localize arbitrary new scans against that map:

    scan → filter → SC descriptor → whole-DB rotation-search retrieval
         (ops/scancontext.detect_loop_between_sessions, no recency exclusion)
         → ICP refinement against the ±W keyframe submap at the saved
           OPTIMIZED poses (models/pipeline.build_submap)
         → metric pose in the saved session's map frame.

The retrieval + refinement are the same jitted device programs the in-session
loop chain runs; only the orchestration differs (single query, no graph)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.config import SlamConfig
from xchu_slam_tpu.models.pipeline import KfDb, build_submap, subsample_cloud
from xchu_slam_tpu.ops import icp, scancontext as sc
from xchu_slam_tpu.ops.filter import filter_scan
from xchu_slam_tpu.types import Cloud, make_cloud
from xchu_slam_tpu.utils import se3


class LocalizeResult(NamedTuple):
    found: bool            # retrieval hit AND ICP verification passed
    kf_idx: int            # matched keyframe in the saved session (-1 if none)
    pose: np.ndarray       # float32[6] query pose in the saved map frame
    sc_dist: float         # Scan Context distance of the match
    yaw: float             # descriptor-estimated relative yaw (rad)
    icp_fitness: float     # mean-sq NN distance after refinement
    icp_converged: bool


class SessionLocalizer:
    """Localize scans against a saved session's keyframe database.

    `db` is the saved KfDb (e.g. `load_checkpoint(path).db` or a device
    pipeline's post-finalize `.db`); `cfg` supplies the filter / SC / ICP
    parameters — use the SAME config the session was mapped with so the
    descriptors bin identically."""

    def __init__(self, db: KfDb, cfg: SlamConfig):
        self.db = db
        self.cfg = cfg
        self.scspec = sc.spec_from_config(cfg.sc)
        self.icpspec = icp.spec_from_config(cfg.loop)

    def localize(self, xyz, intensity=None, max_points: int | None = None
                 ) -> LocalizeResult:
        cfg = self.cfg
        if isinstance(xyz, Cloud):
            cloud = xyz
        else:
            cloud = make_cloud(xyz, intensity,
                               capacity=cfg.filter.max_raw_points)
        filt = filter_scan(cloud, cfg.filter)
        desc = sc.make_descriptor(filt.xyz, filt.mask, self.scspec)
        cand = sc.detect_loop_between_sessions(
            desc, self.db.sc_db, self.db.count, self.scspec)
        if not bool(cand.found):
            return LocalizeResult(False, -1, np.zeros(6, np.float32),
                                  float(cand.dist), float(cand.yaw),
                                  float("inf"), False)
        k = int(cand.idx)
        yaw = float(cand.yaw)

        # metric refinement: query cloud (body frame) onto the ±W submap
        # expressed in the matched keyframe's frame; initial guess is the
        # descriptor's rotation estimate (−yaw = query heading in the match's
        # frame — the same convention the in-session verifier uses)
        n_src = max_points or self.db.clouds.shape[1]
        src_xyz, src_mask, _ = subsample_cloud(filt.xyz, filt.mask, n_src)
        tgt_xyz, tgt_mask, _ = build_submap(
            self.db, jnp.int32(k), jnp.int32(k),
            cfg.loop.submap_half_width, cfg.loop.submap_points)
        T_init = se3.pose_to_matrix(
            jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.0, -yaw], jnp.float32))
        res = icp.align(src_xyz, src_mask, tgt_xyz, tgt_mask, T_init,
                        self.icpspec)
        fitness = float(res.fitness)
        ok = bool(res.converged) and fitness <= cfg.loop.icp_fitness_thresh
        # query pose in the map frame: T_map(match) ∘ T_refined
        T_map = np.asarray(se3.pose_to_matrix(self.db.opt_poses[k]))
        pose = np.asarray(
            se3.matrix_to_pose(jnp.asarray(T_map @ np.asarray(res.T))),
            np.float32)
        return LocalizeResult(ok, k, pose, float(cand.dist), yaw,
                              fitness, bool(res.converged))


def localizer_from_checkpoint(path: str) -> SessionLocalizer:
    """Build a SessionLocalizer from a saved checkpoint (either engine)."""
    from xchu_slam_tpu.utils.checkpoint import load_checkpoint

    pipe = load_checkpoint(path)
    db = pipe.state.db if hasattr(pipe, "state") and pipe.state is not None \
        else pipe.db
    return SessionLocalizer(db, pipe.cfg)
