"""Core pytree data types.

Everything is fixed-shape + mask: the TPU-native replacement for the
reference's dynamically sized `pcl::PointCloud` containers
(reference `include/xchu_mapping/common.h:21-49` for Pose6D).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Cloud(NamedTuple):
    """Fixed-capacity point cloud.

    xyz:       float32[N, 3]  (padded entries are zeros)
    intensity: float32[N]
    mask:      bool[N]        True for valid points
    """

    xyz: jnp.ndarray
    intensity: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask)


def make_cloud(xyz, intensity=None, mask=None, capacity: int | None = None) -> Cloud:
    """Build a Cloud from (possibly ragged) arrays, padding/truncating to
    capacity. Staging (pad/mask) happens in NumPy on the host: one transfer
    per array instead of a chain of tiny device ops."""
    import numpy as np

    if isinstance(xyz, jnp.ndarray) and capacity in (None, xyz.shape[0]) \
            and mask is not None and intensity is not None:
        return Cloud(xyz=xyz, intensity=intensity, mask=mask)

    xyz = np.asarray(xyz, np.float32)
    n = xyz.shape[0]
    intensity = (np.zeros((n,), np.float32) if intensity is None
                 else np.asarray(intensity, np.float32))
    mask = (np.ones((n,), bool) if mask is None else np.asarray(mask, bool))
    if capacity is not None and capacity != n:
        if n > capacity:
            xyz, intensity, mask = xyz[:capacity], intensity[:capacity], mask[:capacity]
        else:
            pad = capacity - n
            xyz = np.pad(xyz, ((0, pad), (0, 0)))
            intensity = np.pad(intensity, (0, pad))
            mask = np.pad(mask, (0, pad))
    xyz = np.where(mask[:, None], xyz, 0.0)
    return Cloud(xyz=jnp.asarray(xyz), intensity=jnp.asarray(intensity),
                 mask=jnp.asarray(mask))


class VoxelGrid(NamedTuple):
    """Dense rolling NDT voxel-statistics grid (see ops/voxel_map.py).

    Replaces the reference's `pclomp::VoxelGridCovariance` leaf hash + kd-tree
    (`voxel_grid_covariance_omp.h:92-187`) and `cpu::VoxelGrid`+Octree with a
    direct-addressed dense tensor anchored near the vehicle.

    origin: float32[3]    world position of voxel (0,0,0) corner
    stats:  float32[V,10] packed accumulators per voxel (V = gx*gy*gz):
                          [n, Σx (3), Σxxᵀ upper-tri (6)] — one array so scan
                          insertion is a single scatter-add
    fin:    float32[V,70] DIRECT7-packed FINALIZED stats: lane block
                          10k:10k+10 of row f holds [mean (3), icov
                          upper-tri (6), valid (1.0/0.0)] of f's k-th
                          DIRECT7 neighbor (block 0 = f itself), built by
                          ops.voxel_map.pack_fin7 — so the per-point
                          neighborhood fetch is ONE latency-bound row
                          gather instead of seven (the gather is the NDT
                          hot loop's dominant cost, see PERF.md MFU table;
                          round 3 fused mean/icov/valid into one row for
                          ~3×, round 5 packs the 7 neighbors for ~7× more).
                          Checkpoints store only the canonical base lanes
                          [:, :10] and re-pack at load.
    """

    origin: jnp.ndarray
    stats: jnp.ndarray
    fin: jnp.ndarray

    @property
    def mean(self) -> jnp.ndarray:
        return self.fin[:, 0:3]

    @property
    def icov(self) -> jnp.ndarray:
        return self.fin[:, 3:9]

    @property
    def valid(self) -> jnp.ndarray:
        return self.fin[:, 9] > 0.0

    @property
    def n(self) -> jnp.ndarray:
        return self.stats[:, 0]

    @property
    def s1(self) -> jnp.ndarray:
        return self.stats[:, 1:4]

    @property
    def s2(self) -> jnp.ndarray:
        return self.stats[:, 4:10]


class KeyframeStore(NamedTuple):
    """Fixed-capacity keyframe database (reference pgo keyframe arrays,
    `pgo.h:75-99`).

    poses:   float32[K, 6]   odometry pose at keyframe (x y z roll pitch yaw)
    opt_poses: float32[K, 6] optimized pose (rewritten after each PGO solve,
                             analogue of `keyframePosesUpdated`, pgo_node.cpp:507-521)
    stamps:  float32[K]      timestamps
    clouds_xyz: float32[K, P, 3]  downsampled keyframe clouds (body frame)
    clouds_mask: bool[K, P]
    count:   int32           number of live keyframes
    """

    poses: jnp.ndarray
    opt_poses: jnp.ndarray
    stamps: jnp.ndarray
    clouds_xyz: jnp.ndarray
    clouds_mask: jnp.ndarray
    count: jnp.ndarray
