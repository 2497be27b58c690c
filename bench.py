"""Benchmark: NDT odometry throughput (scans/s/chip) on synthetic KITTI-like
scans, plus end-to-end trajectory accuracy.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference requires 1× KITTI bag replay = 10 scans/s on a desktop
CPU (reference README.md:47-51; BASELINE.md). vs_baseline = value / 10.

Runs on whatever jax.devices() provides (the real TPU chip under axon; CPU
otherwise). Scan rendering is host-side and excluded from timing; the timed
region is the real per-scan work: filter → NDT align → localmap update.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from xchu_slam_tpu.config import FilterConfig, NdtConfig
    from xchu_slam_tpu.models import odometry
    from xchu_slam_tpu.ops import ndt, voxel_map as vm
    from xchu_slam_tpu.ops.filter import filter_scan
    from xchu_slam_tpu.types import make_cloud
    from xchu_slam_tpu.utils import metrics, sim

    fcfg = FilterConfig(max_raw_points=32768, max_points=16384,
                        outlier_method="radius")  # scans are 24k pts
    ospec = odometry.OdomSpec(
        gspec=vm.GridSpec(gx=80, gy=80, gz=24, resolution=2.0, min_points=6,
                          eig_inflation=0.01),
        nspec=ndt.NdtSpec(max_iterations=30),
        min_add_scan_shift=0.5,
        max_localmap_size=5.0,
        recentre_margin=20.0,
    )

    n_scans = 120
    world = sim.make_world(7, extent=120.0, ground_pts=150_000)
    gt = sim.loop_trajectory(n_scans=400, radius=60.0, speed=1.0)[:n_scans]
    rng = np.random.default_rng(7)
    scans = [sim.render_scan(world, p, rng, n_points=24_000) for p in gt]

    # warmup: compile the chunked program (lax.scan of filter+odometry over a
    # staged 16-scan chunk — ONE h2d transfer + ONE dispatch per chunk; the
    # relay link costs ~0.3 ms fixed latency per transfer, which bounds
    # per-scan staging at ~1.2k scans/s while the device sustains ~12k)
    from xchu_slam_tpu.io.prefetch import DeviceChunkPrefetcher

    CHUNK = 16  # 8 MB/transfer; >8 MB transfers degrade the relay

    xyz0, int0 = scans[0]
    cl0 = make_cloud(xyz0, int0, capacity=fcfg.max_raw_points)
    filt = filter_scan(cl0, fcfg)
    state = odometry.init_state(ospec, jnp.zeros(6), filt.xyz, filt.mask)
    pfw = DeviceChunkPrefetcher(scans[1:CHUNK + 1], capacity=fcfg.max_raw_points,
                                chunk=CHUNK, depth=2, threads=2)
    for clouds_w, _n in pfw:
        state, out_w = odometry.chunk_step(state, clouds_w, fcfg, ospec)
    jax.block_until_ready(out_w.pose)

    # timed run (fresh state, all scans); best-of-3 repeats — the host↔TPU
    # tunnel has multi-hundred-ms latency spikes that would otherwise swamp
    # the ~1-2 ms/scan device time.
    #
    # CRITICAL: no device→host readback may happen before or during the timed
    # loops. The first readback permanently switches the axon relay out of
    # pipelined dispatch (measured: ~900 → ~53 scans/s for this program, in
    # ANY subsequent dispatch in the process), so all accuracy bookkeeping
    # reads happen after the last timed region.
    from xchu_slam_tpu.utils import se3

    best_dt = float("inf")
    for _rep in range(3):
        # streaming path: staging threads transfer chunk k+1.. while the
        # device computes chunk k (io/prefetch.py — the reader-node analogue)
        pf = DeviceChunkPrefetcher(scans[1:], capacity=fcfg.max_raw_points,
                                   chunk=CHUNK, depth=2, threads=2)
        filt = filter_scan(cl0, fcfg)
        state = odometry.init_state(ospec, jnp.zeros(6), filt.xyz, filt.mask)
        t0 = time.perf_counter()
        chunk_poses = []
        for clouds, n_real in pf:
            state, outs = odometry.chunk_step(state, clouds, fcfg, ospec)
            chunk_poses.append((outs.pose, n_real))
        chunk_poses[-1][0].block_until_ready()
        rep_dt = time.perf_counter() - t0
        import sys as _sys
        print(f"rep {(n_scans-1)/rep_dt:.1f} scans/s", file=_sys.stderr)
        best_dt = min(best_dt, rep_dt)

    scans_per_sec = (n_scans - 1) / best_dt

    # ---- phase 2: FULL pipeline (filter→odom→SC loops→ICP→PGO) on a
    # closed circuit with genuine revisits, as ONE on-device program per scan
    # (models/device_pipeline.py) — keyframe gating, descriptors, retrieval,
    # ICP verification, and the pose-graph solve all run under lax.cond on
    # device, so the host dispatches blind and NOTHING is read back until
    # after the timed region (readbacks also poison dispatch, see above).
    from xchu_slam_tpu.config import default_config
    from xchu_slam_tpu.models.device_pipeline import DeviceSlamPipeline

    cfg = default_config().override({
        "filter.max_raw_points": 32768,
        "filter.max_points": 16384,
        "ndt.grid_x": 80, "ndt.grid_y": 80, "ndt.grid_z": 24,
        "pgo.odom_noise_trans": 1e-3, "pgo.odom_noise_rot": 1e-3,
        "loop.icp_fitness_thresh": 1.5,  # synthetic clouds are ~10x sparser than KITTI
        "loop.submap_half_width": 10,
    })
    n_full = 240  # perimeter(30) ≈ 211 m → wraps ~30 m past the start
    gt2 = sim.loop_trajectory(n_scans=n_full, radius=30.0, speed=1.0)
    rng2 = np.random.default_rng(11)
    full_scans = [sim.render_scan(world, p, rng2, n_points=24_000) for p in gt2]
    # warm the compile cache on a throwaway pipeline (same static shapes);
    # lax.cond compiles every branch, so one chunk covers the whole program.
    # block_until_ready only — no device_get before the timed reps.
    warm = DeviceSlamPipeline(cfg, kf_points=4096)
    pfw2 = DeviceChunkPrefetcher(full_scans[:CHUNK], capacity=fcfg.max_raw_points,
                                 chunk=CHUNK, depth=2, threads=2)
    for clouds, n_real in pfw2:
        warm.process_chunk(clouds, 0.1 * np.arange(CHUNK, dtype=np.float32),
                           n_real)
    jax.block_until_ready(warm.state.log)

    dt_full = float("inf")
    for _rep in range(2):
        pipe = DeviceSlamPipeline(cfg, kf_points=4096)
        pf2 = DeviceChunkPrefetcher(full_scans, capacity=fcfg.max_raw_points,
                                    chunk=CHUNK, depth=2, threads=2)
        t1 = time.perf_counter()
        base = 0
        for clouds, n_real in pf2:
            stamps = 0.1 * (base + np.arange(clouds.xyz.shape[0]))
            pipe.process_chunk(clouds, stamps, n_real)
            base += n_real
        jax.block_until_ready(pipe.state.log)
        dt_full = min(dt_full, time.perf_counter() - t1)

    # ---- everything below reads back (end of all timed regions) --------- #
    pipe.finalize()
    gtT = np.asarray(se3.pose_to_matrix(jnp.asarray(gt)))
    gt_rel = np.einsum("ab,nbc->nac", np.linalg.inv(gtT[0]), gtT)[:, :3, 3]
    est = np.vstack([np.zeros((1, 6), np.float32)]
                    + [np.asarray(p)[:n] for p, n in chunk_poses])
    ate = metrics.ape_rmse(est[:, :3], gt_rel[:len(est)], align=False)
    gtT2 = np.asarray(se3.pose_to_matrix(jnp.asarray(gt2)))
    gt2_rel = np.einsum("ab,nbc->nac", np.linalg.inv(gtT2[0]), gtT2)[:, :3, 3]
    stamps, _kf_odo, kf_opt = pipe.keyframe_trajectory()
    idx = np.round(stamps / 0.1).astype(int)
    ate_full = metrics.ape_rmse(kf_opt[:, :3], gt2_rel[idx], align=False)

    print(json.dumps({
        "metric": "ndt_odometry_scans_per_sec",
        "value": round(scans_per_sec, 2),
        "unit": "scans/s/chip",
        "vs_baseline": round(scans_per_sec / 10.0, 2),
        "extra": {
            "odometry_ate_m": round(float(ate), 4),
            "n_scans": n_scans,
            "backend": jax.devices()[0].platform,
            "full_pipeline": {
                "scans": n_full,
                "scans_per_sec": round(n_full / dt_full, 2),
                "keyframes": int(pipe.db.count),
                "loops": pipe.loop_count,
                "ate_m": round(float(ate_full), 4),
            },
        },
    }))


if __name__ == "__main__":
    main()
