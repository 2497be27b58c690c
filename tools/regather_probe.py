"""Measure NDT neighborhood-reuse across Newton iterations (regather_dist).

VERDICT r3 stretch item 8: the DIRECT7 gather is the align path's floor
(~4 ms/pass at 16k pts, toolchain-bound — see PERF.md "Mosaic negative
result"), so attack ITERATION COUNT instead: with `regather_dist > 0` the
gathered neighborhood (ndt_deriv.neighborhood) is reused across Newton
iterations until the pose has moved that far; convergence is only accepted
within a freshness tolerance of the gather pose, so a stale gradient can
never silently terminate the solve (ops/ndt.py newton_body).

This probe runs the SAME device-resident odometry workload as bench.py
phase1 (3 laps of a 608-scan closed circuit, 24k-pt scans, 16k post-filter,
80x80x24 x 2 m grid) at several regather_dist values and reports
rate + unaligned ATE + mean Newton iterations per value, so the
speed/accuracy trade is measured, not argued.

Writes out/regather.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from xchu_slam_tpu.config import FilterConfig
    from xchu_slam_tpu.io.prefetch import DeviceChunkPrefetcher
    from xchu_slam_tpu.models import odometry
    from xchu_slam_tpu.ops import ndt, voxel_map as vm
    from xchu_slam_tpu.ops.filter import filter_scan
    from xchu_slam_tpu.types import make_cloud
    from xchu_slam_tpu.utils import compile_cache, metrics, se3, sim

    compile_cache.enable()

    # pay the relay's first readback up front (see bench.py docstring)
    t0 = time.perf_counter()
    x = jax.block_until_ready(jax.device_put(np.ones(8, np.float32)))
    _ = np.asarray(x)
    probe_s = round(time.perf_counter() - t0, 1)
    print(f"first readback: {probe_s} s", file=sys.stderr)

    CHUNK = 16
    LAP = 608
    LAPS = 3
    n_scans = LAP * LAPS
    fcfg = FilterConfig(max_raw_points=32768, max_points=16384,
                        outlier_method="radius")
    world = sim.make_world(7, extent=120.0, ground_pts=150_000)
    gt = sim.closed_lap_trajectory(n_scans=LAP, radius=85.0)
    rng = np.random.default_rng(7)
    print("rendering lap...", file=sys.stderr)
    scans = [sim.render_scan(world, p, rng, n_points=24_000) for p in gt]

    xyz0, int0 = scans[0]
    cl0 = make_cloud(xyz0, int0, capacity=fcfg.max_raw_points)

    # stage the lap on device once (shared across specs)
    staged = []
    pf = DeviceChunkPrefetcher(scans, capacity=fcfg.max_raw_points,
                               chunk=CHUNK, depth=2, threads=2)
    for clouds, _n in pf:
        staged.append(clouds)

    gtT = np.asarray(se3.pose_to_matrix(jnp.asarray(gt)))
    gt_rel = np.einsum("ab,nbc->nac", np.linalg.inv(gtT[0]), gtT)[:, :3, 3]
    gt3 = np.concatenate([gt_rel] * LAPS, axis=0)

    def run_spec(regather_dist: float, reps: int = 3) -> dict:
        ospec = odometry.OdomSpec(
            gspec=vm.GridSpec(gx=80, gy=80, gz=24, resolution=2.0,
                              min_points=6, eig_inflation=0.01),
            nspec=ndt.NdtSpec(max_iterations=30,
                              regather_dist=regather_dist),
            min_add_scan_shift=0.5,
            max_localmap_size=5.0,
            recentre_margin=20.0,
        )

        def fresh_state():
            filt = filter_scan(cl0, fcfg)
            return odometry.init_state(ospec, jnp.zeros(6), filt.xyz,
                                       filt.mask)

        # warm/compile pass (also produces the accuracy + iteration stats)
        state = fresh_state()
        poses, iters = [], []
        for _ in range(LAPS):
            for clouds in staged:
                state, outs = odometry.chunk_step(state, clouds, fcfg, ospec)
                poses.append(outs.pose)
                iters.append(outs.iterations)
        jax.block_until_ready(poses[-1])
        est = np.concatenate([np.asarray(p) for p in poses], axis=0)
        ate = metrics.ape_rmse(est[:, :3], gt3[:len(est)], align=False)
        it = np.concatenate([np.asarray(i).ravel() for i in iters])

        rates = []
        for _rep in range(reps):
            state = fresh_state()
            t0 = time.perf_counter()
            outs = None
            n = 0
            for _ in range(LAPS):
                for clouds in staged:
                    state, outs = odometry.chunk_step(state, clouds, fcfg,
                                                      ospec)
                    n += 1
                    if n % 4 == 0:
                        jax.block_until_ready(outs.pose)
            _ = np.asarray(outs.pose)            # forced completion
            rates.append(n_scans / (time.perf_counter() - t0))
        row = {
            "regather_dist": regather_dist,
            "device_resident_scans_per_sec": round(
                float(np.median(rates)), 2),
            "rep_scans_per_sec": [round(r, 1) for r in rates],
            "ate_m": round(float(ate), 4),
            "newton_iters_mean": round(float(it.mean()), 2),
            "newton_iters_p95": int(np.percentile(it, 95)),
        }
        print(json.dumps(row), file=sys.stderr)
        return row

    values = [float(v) for v in (sys.argv[1:] or
                                 ["0.0", "0.15", "0.3", "0.6"])]
    rows = [run_spec(v) for v in values]
    out = {"rows": rows, "n_scans": n_scans,
           "relay_first_readback_s": probe_s,
           "backend": jax.devices()[0].platform}
    os.makedirs("out", exist_ok=True)
    with open("out/regather.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
