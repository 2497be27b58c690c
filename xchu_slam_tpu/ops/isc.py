"""Intensity Scan Context (ISC) descriptor + two-stage loop scoring.

TPU-native re-design of `ISCGeneration` (reference `isc/ISCGeneration.cpp`):
- `calculate_isc` (:58-90): polar max-intensity image via scatter-max.
  Intensities are kept as float in [0,1] (the reference stores ×255 uint8).
- `ground_filter` (:284-291): z passthrough band.
- candidate gating (:164-181): travel-distance ≥ 20 m and position distance
  < Δtravel·0.03.
- `calculate_geometry_dis` (:231-257): binary-occupancy agreement maximized
  over all column shifts. NOTE: the reference compares `uchar == true`, which
  matches only cells whose value is exactly 1 — an obvious quirk of the C++
  (SURVEY.md §2f); we implement the intended occupancy test `value > 0`.
- `calculate_intensity_dis` (:259-283): 1 − min mean-L1 over shifts within
  ±10 of the best geometric shift.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class IscSpec(NamedTuple):
    num_ring: int = 60
    num_sector: int = 60
    max_range: float = 40.0
    skip_neighbor_distance: float = 20.0
    inflation_covariance: float = 0.03
    geometry_thresh: float = 0.67
    intensity_thresh: float = 0.91
    ground_z_min: float = -0.9
    ground_z_max: float = 30.0
    intensity_window: int = 10


def spec_from_config(cfg) -> IscSpec:
    return IscSpec(
        num_ring=cfg.num_ring,
        num_sector=cfg.num_sector,
        max_range=cfg.max_range,
        skip_neighbor_distance=cfg.skip_neighbor_distance,
        inflation_covariance=cfg.inflation_covariance,
        geometry_thresh=cfg.geometry_thresh,
        intensity_thresh=cfg.intensity_thresh,
        ground_z_min=cfg.ground_z_min,
        ground_z_max=cfg.ground_z_max,
    )


@functools.partial(jax.jit, static_argnames=("spec",))
def make_descriptor(xyz, intensity, mask, spec: IscSpec) -> jnp.ndarray:
    """Polar max-intensity image [R, S] with crude ground removal."""
    keep = mask & (xyz[:, 2] > spec.ground_z_min) & (xyz[:, 2] < spec.ground_z_max)
    r = jnp.linalg.norm(xyz[:, :2], axis=-1)
    theta = jnp.arctan2(xyz[:, 1], xyz[:, 0]) + jnp.pi
    ring = jnp.floor(r / spec.max_range * spec.num_ring).astype(jnp.int32)
    sector = jnp.floor(theta / (2.0 * jnp.pi) * spec.num_sector).astype(jnp.int32)
    sector = jnp.clip(sector, 0, spec.num_sector - 1)
    ok = keep & (r < spec.max_range) & (ring >= 0) & (ring < spec.num_ring)
    flat = jnp.where(ok, ring * spec.num_sector + sector,
                     spec.num_ring * spec.num_sector)
    img = jnp.zeros((spec.num_ring * spec.num_sector + 1,), jnp.float32)
    img = img.at[flat].max(jnp.where(ok, intensity, 0.0))
    return img[:-1].reshape(spec.num_ring, spec.num_sector)


@functools.partial(jax.jit, static_argnames=("spec",))
def geometry_scores(query, db, spec: IscSpec):
    """Occupancy agreement for every DB entry × every shift.

    Returns (best_score [K], best_shift [K])."""
    S = spec.num_sector
    oq = (query > 0.0).astype(jnp.float32)       # [R,S]
    oc = (db > 0.0).astype(jnp.float32)          # [K,R,S]
    shifts = jnp.arange(S)
    oq_roll = jax.vmap(lambda s: jnp.roll(oq, -s, axis=1))(shifts)  # [S,R,S]
    # agreement = 1 - mean(oq) - mean(oc) + 2·mean(oq·oc)
    cells = spec.num_ring * S
    inter = jnp.einsum("srj,krj->ks", oq_roll, oc) / cells
    mq = jnp.mean(oq)
    mc = jnp.mean(oc, axis=(1, 2))
    agree = 1.0 - mq - mc[:, None] + 2.0 * inter                    # [K,S]
    best_shift = jnp.argmax(agree, axis=1)
    return jnp.max(agree, axis=1), best_shift


@functools.partial(jax.jit, static_argnames=("spec", "chunk"))
def intensity_scores(query, db, best_shift, spec: IscSpec, chunk: int = 64):
    """1 − min mean-L1 over shifts within ±window of best_shift (per entry)."""
    S = spec.num_sector
    W = spec.intensity_window
    shifts = jnp.arange(S)
    q_roll = jax.vmap(lambda s: jnp.roll(query, -s, axis=1))(shifts)  # [S,R,S]

    K = db.shape[0]
    pad = (-K) % chunk
    dbp = jnp.pad(db, ((0, pad), (0, 0), (0, 0)))
    bsp = jnp.pad(best_shift, (0, pad))

    def per_chunk(args):
        dbc, bsc = args
        # mean |q_rolled[s] - c| for all shifts: [C, S]
        diff = jnp.mean(jnp.abs(q_roll[None] - dbc[:, None]), axis=(2, 3))
        # min over the ±W window around best shift
        offs = jnp.arange(-W, W)
        win = (bsc[:, None] + offs[None, :]) % S
        d_win = jnp.take_along_axis(diff, win, axis=1)
        return 1.0 - jnp.min(d_win, axis=1)

    out = jax.lax.map(per_chunk,
                      (dbp.reshape(-1, chunk, *db.shape[1:]),
                       bsp.reshape(-1, chunk)))
    return out.reshape(-1)[:K]


def isc_rgb(desc: jnp.ndarray) -> jnp.ndarray:
    """Render an ISC descriptor as an RGB image uint8 [R, S, 3] — the debug
    visualization the reference publishes on `/isc` (`getLastISCRGB`,
    ISCGeneration.cpp:96-105; jet-style colormap)."""
    v = jnp.clip(desc, 0.0, 1.0)
    # simple jet approximation
    r = jnp.clip(1.5 - jnp.abs(4.0 * v - 3.0), 0, 1)
    g = jnp.clip(1.5 - jnp.abs(4.0 * v - 2.0), 0, 1)
    b = jnp.clip(1.5 - jnp.abs(4.0 * v - 1.0), 0, 1)
    img = jnp.stack([r, g, b], -1)
    img = jnp.where(v[..., None] > 0.0, img, 0.0)
    return (img * 255.0).astype(jnp.uint8)


class IscLoop(NamedTuple):
    idx: jnp.ndarray
    score: jnp.ndarray
    yaw: jnp.ndarray
    found: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("spec", "axis"))
def detect_loop(query, db, db_count, positions, travel, spec: IscSpec,
                axis: str | None = None, cur=None) -> IscLoop:
    """Best gated two-stage ISC loop (reference detectLoopClosureID, :157-193).

    positions: [K_max, 3] keyframe positions; travel: [K_max] cumulative travel
    distance. `cur` is the QUERY keyframe index (default `db_count-1`, the
    newest). Callers whose query may lag the database head — the async
    loop-closure worker detects for frame k after newer keyframes were
    appended — must pass `cur=k`, so the travel/position gates use the query
    frame's own state and the query can never match itself."""
    K = db.shape[0]
    cur = db_count - 1 if cur is None else cur
    cur_pos = positions[cur]
    cur_travel = travel[cur]

    if axis is not None:
        D = jax.lax.axis_size(axis)
        if K % D != 0:
            raise ValueError(f"DB capacity {K} not divisible by mesh size {D}")
        shard = K // D
        base = jax.lax.axis_index(axis) * shard
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, base, shard)
        db_l, pos_l, travel_l = sl(db), sl(positions), sl(travel)
        idxs = base + jnp.arange(shard)
    else:
        base = 0
        db_l, pos_l, travel_l = db, positions, travel
        idxs = jnp.arange(K)

    d_travel = cur_travel - travel_l
    pos_dist = jnp.linalg.norm(pos_l - cur_pos[None], axis=-1)
    gate = (
        (idxs < cur)
        & (d_travel > spec.skip_neighbor_distance)
        & (pos_dist < d_travel * spec.inflation_covariance)
    )
    geo, shift = geometry_scores(query, db_l, spec)
    inten = intensity_scores(query, db_l, shift, spec)
    ok = gate & (geo > spec.geometry_thresh) & (inten > spec.intensity_thresh)
    total = jnp.where(ok, geo + inten, -jnp.inf)
    li = jnp.argmax(total)
    if axis is not None:
        local = jnp.stack([total[li], (base + li).astype(jnp.float32),
                           shift[li].astype(jnp.float32)])
        allv = jax.lax.all_gather(local, axis)            # [D, 3]
        row = allv[jnp.argmax(allv[:, 0])]
        best_total, best, best_shift = row[0], row[1].astype(jnp.int32), row[2]
    else:
        best = li
        best_total = total[li]
        best_shift = shift[li].astype(jnp.float32)
    found = jnp.isfinite(best_total)
    yaw = best_shift * (2.0 * jnp.pi / spec.num_sector)
    yaw = jnp.arctan2(jnp.sin(yaw), jnp.cos(yaw))
    return IscLoop(
        idx=jnp.where(found, best, -1).astype(jnp.int32),
        score=jnp.where(found, best_total, 0.0).astype(jnp.float32),
        yaw=yaw,
        found=found,
    )
