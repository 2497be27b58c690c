"""Keyframe-window localmap strategies (2) and (3).

The reference ships three localmap strategies; only the distance-refresh one
is active (`models/odometry.py`). These are the other two, present in the
reference but with their call sites commented out (`odom_node.cpp:186-202`):

- (2) `ExtractSurroundKeyframes` (`odom_node.cpp:737-802`): localmap = the
  last `surround_search_num` keyframes' clouds.
- (3) `ExtractSurroundKeyframesByDis` (`odom_node.cpp:804-857`): localmap =
  keyframes within a distance gate of the current pose, maintained as a
  deque.

Both build a fresh NDT voxel grid from the selected keyframe clouds — the
analogue of the reference's full `setInputTarget` rebuild for these modes
(`odom_node.cpp:233`, §2f: pcl/omp modes rebuild the target every cycle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from xchu_slam_tpu.ops import voxel_map as vm
from xchu_slam_tpu.utils import se3


@functools.partial(jax.jit, static_argnames=("spec", "window"))
def build_window_localmap(kf_clouds, kf_masks, kf_poses, kf_count,
                          centre_xyz, spec: vm.GridSpec, window: int = 20):
    """Strategy (2): grid from the last `window` keyframes.

    kf_clouds [K,P,3] body-frame, kf_masks [K,P], kf_poses [K,6]."""
    K = kf_clouds.shape[0]
    ks = kf_count - 1 - jnp.arange(window)
    ok = ks >= 0
    ksc = jnp.clip(ks, 0, K - 1)
    T = se3.pose_to_matrix(kf_poses[ksc])
    pts = se3.transform_points(T, kf_clouds[ksc])          # [W,P,3]
    mask = kf_masks[ksc] & ok[:, None]
    grid = vm.make_grid(spec, vm.centered_origin(spec, centre_xyz))
    grid = vm.insert_points(grid, pts.reshape(-1, 3), mask.reshape(-1), spec)
    return vm.finalize(grid, spec)


@functools.partial(jax.jit, static_argnames=("spec", "max_window"))
def build_distance_localmap(kf_clouds, kf_masks, kf_poses, kf_count,
                            centre_xyz, spec: vm.GridSpec,
                            radius: float = 50.0, max_window: int = 50):
    """Strategy (3): grid from keyframes within `radius` of the current pose
    (most recent `max_window` candidates considered)."""
    K = kf_clouds.shape[0]
    ks = kf_count - 1 - jnp.arange(max_window)
    ok = ks >= 0
    ksc = jnp.clip(ks, 0, K - 1)
    d = jnp.linalg.norm(kf_poses[ksc, :2] - jnp.asarray(centre_xyz)[:2][None],
                        axis=-1)
    ok = ok & (d < radius)
    T = se3.pose_to_matrix(kf_poses[ksc])
    pts = se3.transform_points(T, kf_clouds[ksc])
    mask = kf_masks[ksc] & ok[:, None]
    grid = vm.make_grid(spec, vm.centered_origin(spec, centre_xyz))
    grid = vm.insert_points(grid, pts.reshape(-1, 3), mask.reshape(-1), spec)
    return vm.finalize(grid, spec)
