"""Ground-plane segmentation.

TPU-native re-design of the reference's ground pipeline
(`src/filter_node.cpp:72-216`): tilt compensation (:106-112), height clip to
sensor_height ± height_clip via PlaneClip (:113-115), normal filtering — keep
points whose k-NN neighborhood normal is within `normal_angle_deg` of +Z
(:72-101) — RANSAC plane fit (:148-155), verticality check (:162-172), and
upward normal flip (:174-177). Returns `ax+by+cz+d=0` coefficients with a
validity flag (the reference returns an Identity sentinel, :145,159,171).

Normals come from neighborhood covariance smallest-eigenvectors computed with
chunked pairwise top-k on the MXU (no kd-tree); RANSAC evaluates all
hypotheses against all points as one masked matmul.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from xchu_slam_tpu.utils import linalg


class GroundSpec(NamedTuple):
    sensor_height: float = 1.73
    height_clip: float = 2.5
    tilt_deg: float = 0.0
    normal_knn: int = 10
    normal_angle_deg: float = 20.0
    ransac_iters: int = 128
    ransac_thresh: float = 0.1
    plane_angle_deg: float = 10.0


def spec_from_config(cfg) -> GroundSpec:
    return GroundSpec(
        sensor_height=cfg.sensor_height,
        height_clip=cfg.height_clip,
        normal_knn=cfg.normal_knn,
        normal_angle_deg=cfg.normal_angle_deg,
        ransac_iters=cfg.ransac_iters,
        ransac_thresh=cfg.ransac_thresh,
        plane_angle_deg=cfg.plane_angle_deg,
    )


class GroundResult(NamedTuple):
    coeffs: jnp.ndarray       # float32[4] — (a, b, c, d), ‖(a,b,c)‖=1, c>0
    valid: jnp.ndarray        # bool — plane found and near-horizontal
    ground_mask: jnp.ndarray  # bool[N] — inliers of the refined plane
    candidate_mask: jnp.ndarray  # bool[N] — survived clip + normal filtering


def _knn_normals(xyz, mask, k: int, chunk: int = 512):
    """Per-point neighborhood normal via covariance of the k nearest
    neighbors (reference NormalEstimation with k=10)."""
    n = xyz.shape[0]
    chunk = min(chunk, n)
    if n % chunk != 0:
        chunk = math.gcd(n, chunk)
    sq = jnp.sum(xyz * xyz, -1)
    big = jnp.float32(1e30)

    def body(i0):
        rows = jax.lax.dynamic_slice_in_dim(xyz, i0, chunk)
        d2 = (jnp.sum(rows * rows, -1)[:, None] + sq[None, :]
              - 2.0 * rows @ xyz.T)
        d2 = jnp.where(mask[None, :], d2, big)
        _neg, idx = jax.lax.top_k(-d2, k)          # includes self
        nbrs = xyz[idx]                            # [C,k,3]
        mu = jnp.mean(nbrs, axis=1, keepdims=True)
        c = nbrs - mu
        cov = jnp.einsum("cki,ckj->cij", c, c) / k
        return linalg.smallest_eigvec3(cov)

    starts = jnp.arange(0, n, chunk)
    normals = jax.lax.map(body, starts)
    return normals.reshape(n, 3)


@functools.partial(jax.jit, static_argnames=("spec",))
def detect_plane(xyz, mask, spec: GroundSpec, key=None) -> GroundResult:
    """Full ground detection on a (filtered) cloud in the sensor frame."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n = xyz.shape[0]

    # tilt compensation (reference :106-112; default tilt 0)
    if spec.tilt_deg != 0.0:
        t = jnp.deg2rad(spec.tilt_deg)
        R = jnp.array([[jnp.cos(t), 0.0, jnp.sin(t)],
                       [0.0, 1.0, 0.0],
                       [-jnp.sin(t), 0.0, jnp.cos(t)]], jnp.float32)
        xyz = xyz @ R.T

    # PlaneClip: band around the expected ground height
    band = mask & (jnp.abs(xyz[:, 2] + spec.sensor_height) <= spec.height_clip)

    # normal filtering: keep near-horizontal-surface points
    normals = _knn_normals(xyz, band, spec.normal_knn)
    cos_thresh = jnp.cos(jnp.deg2rad(spec.normal_angle_deg))
    horiz = jnp.abs(normals[:, 2]) >= cos_thresh
    cand = band & horiz

    # RANSAC: vmapped hypotheses from random candidate triples
    p = cand.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    n_cand = jnp.sum(cand)

    def hypothesis(k):
        i3 = jax.random.choice(k, n, shape=(3,), p=p)
        a, b, c = xyz[i3[0]], xyz[i3[1]], xyz[i3[2]]
        nrm = jnp.cross(b - a, c - a)
        ln = jnp.linalg.norm(nrm)
        nrm = nrm / jnp.maximum(ln, 1e-9)
        d = -jnp.dot(nrm, a)
        dist = jnp.abs(jnp.sum(xyz * nrm, -1) + d)
        score = jnp.sum(jnp.where(cand, dist < spec.ransac_thresh, False))
        return jnp.where(ln > 1e-9, score, -1), jnp.concatenate([nrm, d[None]])

    keys = jax.random.split(key, spec.ransac_iters)
    scores, planes = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(scores)
    coeffs = planes[best]

    # refine on inliers: centroid + smallest-eigvec of inlier scatter
    dist = jnp.abs(jnp.sum(xyz * coeffs[:3], -1) + coeffs[3])
    inl = cand & (dist < spec.ransac_thresh)
    w = inl.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(xyz * w[:, None], 0) / wsum
    c = (xyz - mu) * w[:, None]
    cov = (c.T @ c) / wsum
    nrm = linalg.smallest_eigvec3(cov)
    # flip upward (reference :174-177)
    nrm = jnp.where(nrm[2] < 0.0, -nrm, nrm)
    d = -jnp.dot(nrm, mu)
    coeffs = jnp.concatenate([nrm, d[None]])

    # verticality check (reference :162-172)
    vert_ok = nrm[2] >= jnp.cos(jnp.deg2rad(spec.plane_angle_deg))
    enough = (n_cand >= 3) & (scores[best] > 0)
    valid = vert_ok & enough

    dist = jnp.abs(jnp.sum(xyz * coeffs[:3], -1) + coeffs[3])
    ground = cand & (dist < spec.ransac_thresh) & valid
    return GroundResult(coeffs=coeffs, valid=valid, ground_mask=ground,
                        candidate_mask=cand)
