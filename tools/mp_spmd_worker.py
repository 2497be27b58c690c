"""Multi-process SPMD worker: one OS process of a multi-process CPU mesh
running the FULL device SLAM engine (SURVEY.md §2d P4 / §7 step 7 — the
reference's three-OS-process TCPROS fabric, `src/pgo_node.cpp:34-46`,
re-designed as one SPMD program whose collectives cross process boundaries).

Launched by tools/run_mp_spmd.py (and tests/test_multiprocess_spmd.py) as:
    python tools/mp_spmd_worker.py --pid 0 --nproc 2 --local-devices 4 ...
with a CLEAN environment (no axon sitecustomize on PYTHONPATH — its PJRT
registration at interpreter start would pin the backend before
jax.distributed.initialize can form the group).

Every process runs the identical host program; the mesh engine state is
replicated and each collective (NDT point reduction, SC retrieval argmin,
ICP moments, pose-graph GN/CG reductions) spans all processes over gloo.
Writes a JSON result with the full keyframe trajectory and content hashes
so the launcher can assert bit-identity across process topologies."""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

# launched with a CLEAN PYTHONPATH (no axon shim), so the repo root must be
# added back explicitly for the package import
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--nproc", type=int, default=1)
    ap.add_argument("--local-devices", type=int, required=True)
    ap.add_argument("--coordinator", default="localhost:29531")
    ap.add_argument("--scans", type=int, default=48)
    ap.add_argument("--radius", type=float, default=12.0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cache-dir", default=None)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)
    import jax

    if args.cache_dir:
        from xchu_slam_tpu.utils import compile_cache
        compile_cache.enable(args.cache_dir)

    if args.nproc > 1:
        from xchu_slam_tpu.parallel import distributed
        distributed.initialize_cpu(args.coordinator, args.nproc, args.pid,
                                   local_devices=args.local_devices)
    else:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.local_devices)

    import numpy as np
    from jax.sharding import Mesh

    from xchu_slam_tpu.config import default_config
    from xchu_slam_tpu.models.device_pipeline import DeviceSlamPipeline, _fetch
    from xchu_slam_tpu.types import make_cloud
    from xchu_slam_tpu.utils import sim

    topo = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    print(f"[worker {args.pid}] {topo}", file=sys.stderr, flush=True)
    assert topo["global_devices"] == args.nproc * args.local_devices

    cfg = default_config().override({
        "filter.max_raw_points": 16384,
        "filter.max_points": 8192,
        "filter.outlier_method": "none",
        "ndt.grid_x": 72, "ndt.grid_y": 72, "ndt.grid_z": 16,
        "pgo.max_keyframes": 256, "pgo.max_loops": 32,
        "loop.submap_half_width": 6, "loop.submap_points": 8192,
        "loop.icp_fitness_thresh": 1.0,
        "sc.dist_thresh": 0.35,
    })
    mesh = Mesh(np.array(jax.devices()), ("data",))

    # deterministic synthetic sequence — every process generates identical
    # host inputs (fixed seeds), mirroring a real deployment where each host
    # reads the same sensor stream
    world = sim.make_world(21, extent=70.0, ground_pts=80_000)
    gt = sim.loop_trajectory(n_scans=args.scans, radius=args.radius,
                             speed=1.0)
    rng = np.random.default_rng(5)

    pipe = DeviceSlamPipeline(cfg, kf_points=4096, log_capacity=256,
                              mesh=mesh)
    for i, p in enumerate(gt):
        xyz, inten = sim.render_scan(world, p, rng, n_points=8000,
                                     max_range=50.0)
        cl = make_cloud(xyz, inten, capacity=cfg.filter.max_raw_points)
        pipe.process_scan(cl, stamp=float(i))
    pipe.finalize()

    n = pipe.kf_count
    opt = _fetch(pipe.db.opt_poses)[:n]
    odo = _fetch(pipe.db.poses)[:n]
    log = np.asarray([r["pose"] for r in pipe.odom_log], np.float32)
    result = {
        "topology": topo,
        "scans": args.scans,
        "kf_count": n,
        "loop_count": pipe.loop_count,
        "scan_count": pipe.scan_count,
        "opt_poses": opt.tolist(),
        "opt_hash": hashlib.sha256(opt.tobytes()).hexdigest(),
        "odom_hash": hashlib.sha256(odo.tobytes()).hexdigest(),
        "log_hash": hashlib.sha256(log.tobytes()).hexdigest(),
    }
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"[worker {args.pid}] kf={n} loops={pipe.loop_count} "
          f"opt_hash={result['opt_hash'][:12]}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
