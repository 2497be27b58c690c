"""NDT neighbor-mode A/B on TPU: device-resident odometry rate + unaligned
3-lap ATE + mean Newton iterations for every neighbor-search mode
(reference NeighborSearchMethod, ndt_omp.h:52-57 — VERDICT r4 item 6's
measured trade table), plus `direct7_rows` (identical DIRECT7 semantics via
the pre-round-5 per-neighbor row gathers) to isolate the packed-table
gather's end-to-end effect.

Measurement discipline per bench.py: pay the first relay readback up front,
force completion at the end of every timed region, report reps.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from xchu_slam_tpu.config import FilterConfig
    from xchu_slam_tpu.io.prefetch import DeviceChunkPrefetcher
    from xchu_slam_tpu.models import odometry
    from xchu_slam_tpu.ops import ndt, voxel_map as vm
    from xchu_slam_tpu.ops.filter import filter_scan
    from xchu_slam_tpu.types import make_cloud
    from xchu_slam_tpu.utils import metrics, se3, sim
    from bench import pay_first_readback, CHUNK

    probe = pay_first_readback()
    fcfg = FilterConfig(max_raw_points=32768, max_points=16384,
                        outlier_method="radius")
    LAP, LAPS = 608, 3
    world = sim.make_world(7, extent=120.0, ground_pts=150_000)
    gt = sim.closed_lap_trajectory(n_scans=LAP, radius=85.0)
    rng = np.random.default_rng(7)
    print("rendering lap...", file=sys.stderr)
    scans = [sim.render_scan(world, p, rng, n_points=24_000) for p in gt]
    cl0 = make_cloud(*scans[0], capacity=fcfg.max_raw_points)

    gtT = np.asarray(se3.pose_to_matrix(jnp.asarray(gt)))
    gt_rel = np.einsum("ab,nbc->nac", np.linalg.inv(gtT[0]), gtT)[:, :3, 3]
    gt3 = np.concatenate([gt_rel] * LAPS, axis=0)

    results = {}
    staged = None
    for mode in ["direct7", "direct7_rows", "direct1", "direct26", "kdtree"]:
        ospec = odometry.OdomSpec(
            gspec=vm.GridSpec(gx=80, gy=80, gz=24, resolution=2.0,
                              min_points=6, eig_inflation=0.01),
            nspec=ndt.NdtSpec(max_iterations=30, neighbor_mode=mode),
            min_add_scan_shift=0.5, max_localmap_size=5.0,
            recentre_margin=20.0)

        def fresh_state():
            filt = filter_scan(cl0, fcfg)
            return odometry.init_state(ospec, jnp.zeros(6), filt.xyz,
                                       filt.mask)

        # warm + stage (staged chunks shared across modes)
        state = fresh_state()
        if staged is None:
            staged = []
            pfw = DeviceChunkPrefetcher(scans, capacity=fcfg.max_raw_points,
                                        chunk=CHUNK, depth=2, threads=2)
            for clouds, _n in pfw:
                staged.append(clouds)
                state, out_w = odometry.chunk_step(state, clouds, fcfg, ospec)
        else:
            for clouds in staged:
                state, out_w = odometry.chunk_step(state, clouds, fcfg, ospec)
        jax.block_until_ready(out_w.pose)

        rates, poses, iters = [], None, None
        for rep in range(2):
            state = fresh_state()
            t0 = time.perf_counter()
            outs_all = []
            n = 0
            for _ in range(LAPS):
                for clouds in staged:
                    state, outs = odometry.chunk_step(state, clouds, fcfg,
                                                      ospec)
                    outs_all.append((outs.pose, outs.iterations))
                    n += 1
                    if n % 4 == 0:
                        jax.block_until_ready(outs.pose)
            _ = np.asarray(outs_all[-1][0])
            rates.append(LAP * LAPS / (time.perf_counter() - t0))
            poses = np.concatenate([np.asarray(p) for p, _ in outs_all])
            iters = np.concatenate([np.asarray(i) for _, i in outs_all])
        ate = metrics.ape_rmse(poses[:, :3], gt3[:len(poses)], align=False)
        results[mode] = {
            "device_resident_scans_per_sec": round(float(np.median(rates)), 1),
            "rep_rates": [round(r, 1) for r in rates],
            "ate_unaligned_3lap_m": round(float(ate), 3),
            "mean_newton_iters": round(float(iters.mean()), 2),
            "p95_newton_iters": float(np.quantile(iters, 0.95)),
        }
        print(f"{mode}: {results[mode]}", file=sys.stderr)

    out = {"relay_probe": probe, "modes": results,
           "workload": {"lap": LAP, "laps": LAPS, "points": 16384,
                        "note": "device-resident chunked odometry, "
                                "bench.py phase1 workload; direct7_rows = "
                                "identical DIRECT7 semantics via per-"
                                "neighbor row gathers (pre-round-5 path)"}}
    print(json.dumps(out))
    with open("docs/artifacts/neighbor_modes.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
