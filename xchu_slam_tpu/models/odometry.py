"""NDT scan-to-localmap odometry (the reference's LidarOdom, re-designed).

Covers `src/odom_node.cpp:208-423` (`OdomEstimate`): constant-velocity initial
guess with roll/pitch hold (`:237-254`), NDT alignment against the active
localmap, and the distance-refresh localmap strategy (`:329-356`): append the
scan to the localmap every `min_add_scan_shift` metres of 2-D travel, and when
the accumulated travel reaches `max_localmap_size` reset the active map to the
recently started `tmp` map (double-buffered here as grids A/B).

The whole per-scan step — alignment (Newton + line search), conditional map
insertion, conditional map swap, conditional grid recentring — is ONE
jit-compiled device program operating on a functional `OdomState` pytree; the
reference's mutex-guarded mutable members (`odom_node.h:100-150`) have no
analogue.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from xchu_slam_tpu.ops import ndt, voxel_map as vm
from xchu_slam_tpu.types import VoxelGrid
from xchu_slam_tpu.utils import se3


class OdomSpec(NamedTuple):
    """Static odometry parameters."""

    gspec: vm.GridSpec
    nspec: ndt.NdtSpec
    min_add_scan_shift: float = 0.5
    max_localmap_size: float = 5.0
    recentre_margin: float = 20.0


def spec_from_config(cfg) -> OdomSpec:
    return OdomSpec(
        gspec=vm.spec_from_config(cfg.ndt),
        nspec=ndt.spec_from_config(cfg.ndt),
        min_add_scan_shift=cfg.odom.min_add_scan_shift,
        max_localmap_size=cfg.odom.max_localmap_size,
        recentre_margin=cfg.ndt.recentre_margin,
    )


class OdomState(NamedTuple):
    pose: jnp.ndarray            # float32[6] current pose
    prev_pose: jnp.ndarray       # float32[6]
    diff: jnp.ndarray            # float32[6] last inter-scan delta
    grid_a: VoxelGrid            # active localmap (alignment target)
    grid_b: VoxelGrid            # tmp localmap being accumulated
    localmap_travel: jnp.ndarray  # float32 accumulated insert shift
    added_pose: jnp.ndarray      # float32[6] pose at last insertion


class OdomOutput(NamedTuple):
    pose: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray
    score: jnp.ndarray
    matched_frac: jnp.ndarray
    fitness: jnp.ndarray
    inserted: jnp.ndarray
    swapped: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("fcfg", "spec"),
                   donate_argnames=("state",))
def chunk_step(state: OdomState, clouds, fcfg, spec: OdomSpec):
    """Filter + odometry for a CHUNK of scans in one device program:
    `lax.scan` over the leading axis of a staged Cloud batch
    (io/prefetch.DeviceChunkPrefetcher). One dispatch + one h2d transfer per
    chunk instead of per scan — the link's fixed per-transfer latency
    (~0.3 ms on the relay) amortizes across the chunk.

    Empty trailing slots (mask all-False, short final chunk) are no-ops by
    construction: zero valid points → zero NDT gradient → zero step.

    Returns (new_state, stacked OdomOutput with leading chunk axis)."""
    from xchu_slam_tpu.ops.filter import filter_scan

    def body(st, cloud):
        filt = filter_scan(cloud, fcfg)
        new_st, out = step(st, filt.xyz, filt.mask, spec)
        return new_st, out

    return jax.lax.scan(body, state, clouds)


def init_state(spec: OdomSpec, init_pose, xyz, mask) -> OdomState:
    """Seed both localmaps with the first scan at `init_pose`
    (reference odom_node.cpp:218-231)."""
    init_pose = jnp.asarray(init_pose, jnp.float32)
    pts_map = se3.rotate_translate(init_pose, xyz)
    origin_centre = init_pose[:3]
    ga = vm.make_grid(spec.gspec, vm.centered_origin(spec.gspec, origin_centre))
    gb = vm.make_grid(spec.gspec, vm.centered_origin(spec.gspec, origin_centre))
    ga = vm.insert_points(ga, pts_map, mask, spec.gspec)
    gb = vm.insert_points(gb, pts_map, mask, spec.gspec)
    ga = vm.finalize(ga, spec.gspec)
    # distinct buffers: `step` donates the whole state, and donated leaves
    # must not alias each other
    return OdomState(
        pose=init_pose,
        prev_pose=jnp.array(init_pose),
        diff=jnp.zeros(6, jnp.float32),
        grid_a=ga,
        grid_b=gb,
        localmap_travel=jnp.float32(0.0),
        added_pose=jnp.array(init_pose),
    )


def _guess(state: OdomState, ext_delta, use_ext) -> jnp.ndarray:
    """Initial-guess prediction; roll/pitch held at the previous values
    (reference odom_node.cpp:237-254). With `use_ext`, the delta comes from an
    external provider (IMU / wheel odometry, see ops/imu.py — the reference's
    use_imu/use_odom modes) instead of the constant-velocity model."""
    delta = jnp.where(use_ext, ext_delta, state.diff)
    g = state.pose + delta
    g = g.at[3].set(state.pose[3])
    g = g.at[4].set(state.pose[4])
    g = g.at[5].set(se3.wrap_angle(g[5]))
    return g


@functools.partial(jax.jit, static_argnames=("spec", "axis"),
                   donate_argnames=("state",))
def step(state: OdomState, xyz, mask, spec: OdomSpec,
         ext_delta=None, use_ext=False, axis: str | None = None):
    """One odometry scan step. Returns (new_state, OdomOutput).

    With `axis` set (inside a replicated-input `shard_map`), the NDT hot loop
    shards the scan's points over the mesh (ops/ndt.align); the cheap map
    maintenance (insert/swap/recentre scatter-adds) runs replicated so the
    localmap grids stay identical on every device with zero communication."""
    if ext_delta is None:
        ext_delta = jnp.zeros(6, jnp.float32)
    guess = _guess(state, ext_delta, jnp.asarray(use_ext))
    res = ndt.align(state.grid_a, xyz, mask, guess, spec.gspec, spec.nspec,
                    axis=axis)
    pose = res.pose
    diff = pose - state.pose
    diff = diff.at[3:].set(se3.wrap_angle(diff[3:]))

    shift = jnp.linalg.norm(pose[:2] - state.added_pose[:2])
    do_insert = shift >= spec.min_add_scan_shift

    def insert(operand):
        ga, gb, travel, added = operand
        pts_map = se3.rotate_translate(pose, xyz)
        # one fused scatter for both grids (identical origins by
        # construction — see vm.insert_points_pair)
        ga, gb = vm.insert_points_pair(ga, gb, pts_map, mask, spec.gspec)
        ga = vm.finalize(ga, spec.gspec)
        return ga, gb, travel + shift, pose

    def no_insert(operand):
        return operand

    ga, gb, travel, added = jax.lax.cond(
        do_insert, insert, no_insert,
        (state.grid_a, state.grid_b, state.localmap_travel, state.added_pose),
    )

    do_swap = travel >= spec.max_localmap_size

    def swap(operand):
        ga, gb = operand
        ga_new = vm.finalize(gb, spec.gspec)
        gb_new = vm.make_grid(spec.gspec, gb.origin)
        return ga_new, gb_new, jnp.float32(0.0)

    def no_swap(operand):
        ga, gb = operand
        return ga, gb, travel

    ga, gb, travel = jax.lax.cond(do_swap, swap, no_swap, (ga, gb))

    # recentre both grids when the vehicle nears the active grid's edge
    half = jnp.array(
        [spec.gspec.gx, spec.gspec.gy, spec.gspec.gz], jnp.float32
    ) * (spec.gspec.resolution / 2.0)
    centre = ga.origin + half
    margin_xy = jnp.minimum(half[0], half[1]) - spec.recentre_margin
    off = jnp.max(jnp.abs(pose[:2] - centre[:2]))
    do_recentre = off > margin_xy

    def recentre(operand):
        ga, gb = operand
        return (vm.recentre(ga, pose[:3], spec.gspec),
                vm.recentre(gb, pose[:3], spec.gspec))

    ga, gb = jax.lax.cond(do_recentre, recentre, lambda o: o, (ga, gb))

    new_state = OdomState(
        pose=pose,
        prev_pose=state.pose,
        diff=diff,
        grid_a=ga,
        grid_b=gb,
        localmap_travel=travel,
        added_pose=added,
    )
    out = OdomOutput(
        pose=pose,
        iterations=res.iterations,
        converged=res.converged,
        score=res.score,
        matched_frac=res.matched_frac,
        fitness=res.fitness,
        inserted=do_insert,
        swapped=do_swap,
    )
    return new_state, out
