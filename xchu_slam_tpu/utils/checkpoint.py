"""Mid-run checkpoint / resume.

The reference has no checkpointing at all — only terminal SaveMap on shutdown
(SURVEY.md §5: 'a crash loses all state'). Here the full SLAM state — keyframe
database (poses, clouds, descriptors), factor graph, odometry state including
the voxel grids, and host counters — serializes to one compressed npz and
restores to a resumable pipeline.
"""

from __future__ import annotations

import json

import numpy as np


def _flatten(prefix: str, tree) -> dict:
    out = {}
    for name, val in zip(tree._fields, tree):
        key = f"{prefix}.{name}"
        if hasattr(val, "_fields"):
            out.update(_flatten(key, val))
        else:
            out[key] = np.asarray(val)
    return out


def _slim_grid_fin(arrays: dict, cfg) -> None:
    """Store voxel-grid `fin` tables in their canonical [V,10] interior base
    form: the on-device [Vp,70] DIRECT7-packed border-padded layout
    (ops.voxel_map.pack_fin7) is a pure function of the base lanes,
    re-packed at load — ~8x smaller checkpoints and format-compatible with
    pre-round-5 files both ways."""
    from xchu_slam_tpu.ops import voxel_map as vm

    spec = vm.spec_from_config(cfg.ndt)
    for k in list(arrays):
        if k.endswith(".fin") and arrays[k].ndim == 2 \
                and arrays[k].shape[1] == 70:
            arrays[k] = np.asarray(vm.unpack_base(arrays[k], spec))


def _repack_grid_fin(data: dict, cfg) -> None:
    """Inverse of _slim_grid_fin: [V,10] stored base → [Vp,70] packed."""
    from xchu_slam_tpu.ops import voxel_map as vm

    spec = vm.spec_from_config(cfg.ndt)
    for k in list(data):
        if k.endswith(".fin") and data[k].ndim == 2 \
                and data[k].shape[1] == 10:
            base = np.asarray(data[k], np.float32)
            data[k] = np.asarray(vm.pack_fin7(base, spec))


def save_checkpoint(pipe, path: str) -> None:
    """Checkpoint either pipeline flavour: the host-orchestrated SlamPipeline
    or the fully on-device DeviceSlamPipeline (models/device_pipeline.py)."""
    if hasattr(pipe, "state"):
        _save_device_checkpoint(pipe, path)
        return
    arrays = {}
    arrays.update(_flatten("db", pipe.db))
    arrays.update(_flatten("graph", pipe.graph))
    if pipe.odom_state is not None:
        arrays.update(_flatten("odom", pipe.odom_state))
    meta = {
        "engine": "host",
        "loop_count": pipe.loop_count,
        "scan_count": pipe.scan_count,
        "kf_gate_accum": pipe.kf_gate_accum,
        "travel": pipe.travel,
        "kf_points": pipe.kf_points,
        "loops": [(r.i, r.j, r.fitness, r.method) for r in pipe.loops],
        "last_odom_pose": None if pipe._last_odom_pose is None
        else np.asarray(pipe._last_odom_pose).tolist(),
        "last_kf_odom": None if pipe._last_kf_odom is None
        else np.asarray(pipe._last_kf_odom).tolist(),
        "config": pipe.cfg.to_json(),
    }
    _slim_grid_fin(arrays, pipe.cfg)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def _save_device_checkpoint(pipe, path: str) -> None:
    if pipe.state is None:
        raise ValueError("device pipeline has no state yet (no scans fed)")
    arrays = _flatten("state", pipe.state)
    _slim_grid_fin(arrays, pipe.cfg)
    meta = {
        "engine": "device",
        "kf_points": pipe.kf_points,
        "log_capacity": pipe.spec.log_capacity,
        "config": pipe.cfg.to_json(),
    }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def _migrate_legacy(data: dict) -> None:
    """In-place migration of pre-round-3 checkpoint layouts.

    Round 3 packed VoxelGrid's finalized tables (mean/icov/valid → one
    `fin[V,10]`) and added DevState.last_stamp; older checkpoints carry the
    separate arrays and no stamp. Both are exactly reconstructible, so old
    sessions stay loadable (the multi-session `localize` feature exists to
    read previously saved sessions). Unknown missing keys still fail, with
    a clear error naming the checkpoint as the cause."""
    for key in [k for k in data if k.endswith(".mean")]:
        p = key[: -len(".mean")]
        if f"{p}.fin" in data or f"{p}.icov" not in data \
                or f"{p}.valid" not in data:
            continue
        data[f"{p}.fin"] = np.concatenate(
            [np.asarray(data[f"{p}.mean"], np.float32),
             np.asarray(data[f"{p}.icov"], np.float32),
             np.asarray(data[f"{p}.valid"], np.float32)[:, None]], axis=-1)
    if "state.scan_count" in data and "state.last_stamp" not in data:
        # seed from the newest stamp in the restored log ring (row column 10)
        # rather than 0.0: with use_imu the first post-resume scan computes
        # dt = stamp − last_stamp for the velocity reset, and a zero seed
        # makes dt the ABSOLUTE stamp (possibly hundreds of seconds) — the
        # reset velocity then snaps to ~0 and the first NDT guess degrades
        last = np.float32(0.0)
        if "state.log" in data and "state.scan_count" in data:
            log = np.asarray(data["state.log"])
            n = int(np.asarray(data["state.scan_count"]))
            if log.ndim == 2 and log.shape[1] >= 11 and n > 0:
                rows = log[:min(n, log.shape[0])]
                last = np.float32(rows[:, 10].max())
        data["state.last_stamp"] = last


def load_checkpoint(path: str):
    """Restore a pipeline (SlamPipeline or DeviceSlamPipeline, per how it was
    saved) from a checkpoint file."""
    import jax.numpy as jnp

    from xchu_slam_tpu.config import SlamConfig
    from xchu_slam_tpu.models import odometry
    from xchu_slam_tpu.models.pipeline import KfDb, LoopRecord, SlamPipeline
    from xchu_slam_tpu.models.pose_graph import GraphData
    from xchu_slam_tpu.types import VoxelGrid

    data = dict(np.load(path).items())
    _migrate_legacy(data)
    meta = json.loads(bytes(data["__meta__"]).decode())
    cfg = SlamConfig.from_json(meta["config"])
    _repack_grid_fin(data, cfg)

    if meta.get("engine") == "device":
        from xchu_slam_tpu.models.device_pipeline import (DeviceSlamPipeline,
                                                          DevState)

        dpipe = DeviceSlamPipeline(cfg, kf_points=meta["kf_points"],
                                   log_capacity=meta["log_capacity"])

        def unflatten_d(prefix, cls):
            vals = []
            for name in cls._fields:
                key = f"{prefix}.{name}"
                if key in data:
                    vals.append(jnp.asarray(data[key]))
                elif (cls.__name__, name) in _NESTED_D:
                    vals.append(unflatten_d(key, _NESTED_D[(cls.__name__, name)]))
                else:
                    raise ValueError(
                        f"checkpoint {path!r} is missing {key!r} — saved by "
                        f"an incompatible version of this package")
            return cls(*vals)

        _NESTED_D = {("DevState", "odom"): odometry.OdomState,
                     ("DevState", "db"): KfDb,
                     ("DevState", "graph"): GraphData,
                     ("OdomState", "grid_a"): VoxelGrid,
                     ("OdomState", "grid_b"): VoxelGrid}
        dpipe.state = unflatten_d("state", DevState)
        return dpipe

    pipe = SlamPipeline(cfg, kf_points=meta["kf_points"])

    def unflatten(prefix, cls, casts=None):
        vals = []
        for name in cls._fields:
            key = f"{prefix}.{name}"
            if key in data:
                vals.append(jnp.asarray(data[key]))
            elif (cls.__name__, name) in _NESTED:
                vals.append(unflatten(key, _NESTED[(cls.__name__, name)]))
            else:
                raise ValueError(
                    f"checkpoint {path!r} is missing {key!r} — saved by "
                    f"an incompatible version of this package")
        return cls(*vals)

    _NESTED = {("OdomState", "grid_a"): VoxelGrid,
               ("OdomState", "grid_b"): VoxelGrid}

    pipe.db = unflatten("db", KfDb)
    pipe.graph = unflatten("graph", GraphData)
    if "odom.pose" in data:
        pipe.odom_state = unflatten("odom", odometry.OdomState)
    pipe.loop_count = int(meta["loop_count"])
    pipe.scan_count = int(meta["scan_count"])
    pipe.kf_count = int(np.asarray(data["db.count"]))
    pipe.kf_gate_accum = float(meta["kf_gate_accum"])
    pipe.travel = float(meta["travel"])
    pipe.loops = [LoopRecord(i=i, j=j, fitness=f, method=m)
                  for (i, j, f, m) in meta["loops"]]
    if meta["last_odom_pose"] is not None:
        pipe._last_odom_pose = np.asarray(meta["last_odom_pose"], np.float32)
    if meta["last_kf_odom"] is not None:
        pipe._last_kf_odom = np.asarray(meta["last_kf_odom"], np.float32)
    return pipe
