"""Dense rolling NDT voxel-statistics grid.

TPU-native re-design of the reference's NDT target-map machinery:
- `pclomp::VoxelGridCovariance` two-pass Σx/Σxxᵀ accumulation + per-leaf
  mean/cov/eigen-inflation/icov (`voxel_grid_covariance_omp_impl.hpp:159-364`)
- `cpu::VoxelGrid` incremental `updateVoxelGrid` insertion
  (`ndt_cpu/NormalDistributionsTransform.h:39`, `VoxelGrid.h:17-150`)
- `getNeighborhoodAtPoint7/1` DIRECT lattice lookups
  (`voxel_grid_covariance_omp_impl.hpp:373-441`)

Instead of a hash map + kd-tree/octree over leaves, the map is a
direct-addressed dense tensor of voxel statistics anchored near the vehicle
(a rolling grid). Scatter-adds build the statistics; DIRECT7 neighborhoods are
constant-offset gathers; there is no pointer structure anywhere.

Numerical note: statistics are accumulated in *voxel-corner-relative*
coordinates so Σxxᵀ − n·μμᵀ never cancels catastrophically in float32, and the
accumulated stats are invariant under grid recentring (only indices move).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from xchu_slam_tpu.types import VoxelGrid
from xchu_slam_tpu.utils import linalg


class GridSpec(NamedTuple):
    """Static grid geometry (hashable; closed over by jitted fns)."""

    gx: int
    gy: int
    gz: int
    resolution: float
    min_points: int
    eig_inflation: float

    @property
    def num_voxels(self) -> int:
        return self.gx * self.gy * self.gz


def spec_from_config(ndt_cfg) -> GridSpec:
    return GridSpec(
        gx=ndt_cfg.grid_x,
        gy=ndt_cfg.grid_y,
        gz=ndt_cfg.grid_z,
        resolution=ndt_cfg.resolution,
        min_points=ndt_cfg.min_points_per_voxel,
        eig_inflation=ndt_cfg.eig_inflation,
    )


def make_grid(spec: GridSpec, origin: jnp.ndarray) -> VoxelGrid:
    """Empty grid whose voxel (0,0,0) corner sits at `origin` (float32[3])."""
    V = spec.num_voxels
    return VoxelGrid(
        origin=jnp.asarray(origin, jnp.float32),
        stats=jnp.zeros((V, 10), jnp.float32),
        fin=jnp.zeros((num_voxels_padded(spec), 70), jnp.float32),
    )


def _padded_dims(spec: GridSpec):
    """The packed `fin` table carries a 1-voxel EMPTY BORDER: a point whose
    own voxel lies just outside the grid still has in-bounds DIRECT7
    neighbors (the reference accepts those — getNeighborhoodAtPoint checks
    each neighbor's bounds, not the centre's,
    voxel_grid_covariance_omp_impl.hpp:385-396), and the border gives such
    points a (always-empty) centre row whose packed neighbor blocks are the
    CORRECT interior rows."""
    return spec.gx + 2, spec.gy + 2, spec.gz + 2


def num_voxels_padded(spec: GridSpec) -> int:
    px, py, pz = _padded_dims(spec)
    return px * py * pz


def _flat_offsets7_padded(spec: GridSpec):
    """Flat-index deltas of the DIRECT7 offsets under the PADDED
    (x·py + y)·pz + z layout: z±1 → ±1, y±1 → ±pz, x±1 → ±py·pz."""
    _px, py, pz = _padded_dims(spec)
    return [int((ox * py + oy) * pz + oz) for ox, oy, oz in _OFFSETS7]


def pack_fin7(fin_base: jnp.ndarray, spec: GridSpec) -> jnp.ndarray:
    """[V,10] finalized stats → [Vp,70] DIRECT7-packed, border-padded table.

    Lane block 10k:10k+10 of padded row f holds the stats of f's k-th
    DIRECT7 neighbor (k ordered as _OFFSETS7; block 0 IS the row's own
    stats), built by padding an empty 1-voxel border then seven flat rolls —
    so the per-point neighborhood fetch becomes ONE 70-lane row gather
    instead of seven 10-lane row gathers. TPU row gathers are latency-bound
    per ROW (each reads a full lane line of which only the row's lanes are
    useful — mfu.json round 4: 2.4 GB/s on an 819 GB/s part; packing
    measured it to ~4x).

    Correctness: a packed block is only USED where lookup_neighbors' `inb`
    (computed from the TRUE neighbor coordinates) is True; every such block
    is an interior row reached without clipping thanks to the border, and
    flat-roll wraps land only in rows whose blocks are never selected."""
    g = fin_base.reshape(spec.gx, spec.gy, spec.gz, fin_base.shape[-1])
    gp = jnp.pad(g, ((1, 1), (1, 1), (1, 1), (0, 0)))
    base_p = gp.reshape(num_voxels_padded(spec), fin_base.shape[-1])
    return jnp.concatenate(
        [jnp.roll(base_p, -o, axis=0) for o in _flat_offsets7_padded(spec)],
        axis=1)


def unpack_base(fin: jnp.ndarray, spec: GridSpec) -> jnp.ndarray:
    """Inverse of pack_fin7's layout: padded [Vp,70] → interior base [V,10]
    (a pure slice — block 0 of each interior row is that voxel's own
    stats)."""
    px, py, pz = _padded_dims(spec)
    g = fin[:, :10].reshape(px, py, pz, 10)
    return g[1:-1, 1:-1, 1:-1].reshape(spec.num_voxels, 10)


def centered_origin(spec: GridSpec, centre_xyz) -> jnp.ndarray:
    """Voxel-aligned origin placing `centre_xyz` at the grid centre."""
    half = jnp.array(
        [spec.gx // 2, spec.gy // 2, spec.gz // 2], jnp.float32
    ) * spec.resolution
    c = jnp.asarray(centre_xyz, jnp.float32)
    return jnp.floor((c - half) / spec.resolution) * spec.resolution


def _voxel_index3(spec: GridSpec, origin: jnp.ndarray, xyz: jnp.ndarray):
    """World points → integer voxel coords + in-bounds flag."""
    idx = jnp.floor((xyz - origin) / spec.resolution).astype(jnp.int32)
    inb = (
        (idx[..., 0] >= 0) & (idx[..., 0] < spec.gx)
        & (idx[..., 1] >= 0) & (idx[..., 1] < spec.gy)
        & (idx[..., 2] >= 0) & (idx[..., 2] < spec.gz)
    )
    return idx, inb


def _flat(spec: GridSpec, idx3: jnp.ndarray, inb: jnp.ndarray) -> jnp.ndarray:
    """int voxel coords → flat index; out-of-bounds → sentinel V (dropped/empty)."""
    flat = (idx3[..., 0] * spec.gy + idx3[..., 1]) * spec.gz + idx3[..., 2]
    return jnp.where(inb, flat, spec.num_voxels)


@functools.partial(jax.jit, static_argnames=("spec",), donate_argnames=("grid",))
def insert_points(grid: VoxelGrid, xyz: jnp.ndarray, mask: jnp.ndarray,
                  spec: GridSpec) -> VoxelGrid:
    """Accumulate scan points into the grid statistics (incremental
    `updateVoxelGrid` semantics — no rebuild, just scatter-add)."""
    idx3, inb = _voxel_index3(spec, grid.origin, xyz)
    flat = _flat(spec, idx3, inb & mask)
    corner = grid.origin + idx3.astype(jnp.float32) * spec.resolution
    local = xyz - corner
    l = jnp.where((inb & mask)[:, None], local, 0.0)
    row = jnp.concatenate(
        [jnp.where(inb & mask, 1.0, 0.0)[:, None],
         l,
         jnp.stack([l[:, 0] * l[:, 0], l[:, 0] * l[:, 1], l[:, 0] * l[:, 2],
                    l[:, 1] * l[:, 1], l[:, 1] * l[:, 2], l[:, 2] * l[:, 2]],
                   -1)],
        -1,
    )  # [N,10] — one scatter-add updates all accumulators
    V = spec.num_voxels
    stats = jnp.concatenate(
        [grid.stats, jnp.zeros((1, 10), grid.stats.dtype)]
    ).at[flat].add(row)[:V]
    return grid._replace(stats=stats)


@functools.partial(jax.jit, static_argnames=("spec",),
                   donate_argnames=("ga", "gb"))
def insert_points_pair(ga: VoxelGrid, gb: VoxelGrid, xyz: jnp.ndarray,
                       mask: jnp.ndarray, spec: GridSpec):
    """Insert the same scan into BOTH localmap grids with ONE scatter.

    The odometry double-buffer (reference odom_node.cpp:329-356: every
    qualifying scan goes into `localmap` AND `tmp_map`) keeps grids A/B at
    IDENTICAL origins by construction (created together, recentred together,
    swap reuses the origin), so the voxel indices coincide and the two
    [N,10] scatter-adds — the latency-bound part, per-ROW cost — fuse into
    one [N,20] scatter at roughly single-scatter cost (measured in bench
    phase1/3; scatter rows are the cost, lanes are nearly free)."""
    idx3, inb = _voxel_index3(spec, ga.origin, xyz)
    flat = _flat(spec, idx3, inb & mask)
    corner = ga.origin + idx3.astype(jnp.float32) * spec.resolution
    local = xyz - corner
    l = jnp.where((inb & mask)[:, None], local, 0.0)
    row = jnp.concatenate(
        [jnp.where(inb & mask, 1.0, 0.0)[:, None],
         l,
         jnp.stack([l[:, 0] * l[:, 0], l[:, 0] * l[:, 1], l[:, 0] * l[:, 2],
                    l[:, 1] * l[:, 1], l[:, 1] * l[:, 2], l[:, 2] * l[:, 2]],
                   -1)],
        -1,
    )
    V = spec.num_voxels
    both = jnp.concatenate([ga.stats, gb.stats], axis=1)        # [V,20]
    both = jnp.concatenate(
        [both, jnp.zeros((1, 20), both.dtype)]
    ).at[flat].add(jnp.concatenate([row, row], axis=1))[:V]
    return (ga._replace(stats=both[:, :10]),
            gb._replace(stats=both[:, 10:]))


@functools.partial(jax.jit, static_argnames=("spec",), donate_argnames=("grid",))
def finalize(grid: VoxelGrid, spec: GridSpec) -> VoxelGrid:
    """Per-voxel mean / covariance / inflated inverse covariance
    (reference `voxel_grid_covariance_omp_impl.hpp:329-364`). Voxels with
    fewer than `min_points` points are invalid (`:204`)."""
    n = grid.n
    valid = n >= spec.min_points
    denom = jnp.maximum(n, 1.0)
    mean = grid.s1 / denom[:, None]  # voxel-local mean
    m = mean
    mouter = jnp.stack(
        [m[:, 0] * m[:, 0], m[:, 0] * m[:, 1], m[:, 0] * m[:, 2],
         m[:, 1] * m[:, 1], m[:, 1] * m[:, 2], m[:, 2] * m[:, 2]],
        -1,
    )
    # Bessel-style correction as in the reference (:329-330)
    bessel = jnp.maximum(n - 1.0, 1.0)
    cov6 = (grid.s2 - n[:, None] * mouter) / bessel[:, None]
    cov = linalg.sym6_to_mat(cov6)
    icov = linalg.inflate_and_invert_cov(cov, spec.eig_inflation)
    icov6 = linalg.mat_to_sym6(icov)
    icov6 = jnp.where(valid[:, None], icov6, 0.0)
    mean = jnp.where(valid[:, None], mean, 0.0)
    # pack [mean | icov6 | valid] into ONE table, then DIRECT7-pack the
    # seven neighbor tables into the 70-lane row (pack_fin7): the
    # neighborhood fetch is a SINGLE row gather per point (round 3 fused the
    # three tables into one ~3× win; round 5 packs the seven neighbors for
    # the next ~7× on the latency-bound row gather)
    fin_base = jnp.concatenate(
        [mean, icov6, valid.astype(jnp.float32)[:, None]], -1)
    return grid._replace(fin=pack_fin7(fin_base, spec))


@functools.partial(jax.jit, static_argnames=("spec",), donate_argnames=("grid",))
def recentre(grid: VoxelGrid, new_centre: jnp.ndarray, spec: GridSpec) -> VoxelGrid:
    """Roll the grid so `new_centre` sits at the grid centre.

    Voxel-corner-relative statistics make this a pure index shift: content that
    stays in-bounds is preserved exactly; voxels shifted out are dropped, newly
    exposed voxels start empty."""
    new_origin = centered_origin(spec, new_centre)
    shift = jnp.round((new_origin - grid.origin) / spec.resolution).astype(jnp.int32)

    def roll3(a):
        extra = a.shape[1:]
        g = a.reshape(spec.gx, spec.gy, spec.gz, *extra)
        g = jnp.roll(g, (-shift[0], -shift[1], -shift[2]), axis=(0, 1, 2))
        # zero the wrapped bands
        ix = jnp.arange(spec.gx)
        iy = jnp.arange(spec.gy)
        iz = jnp.arange(spec.gz)
        okx = (ix + shift[0] >= 0) & (ix + shift[0] < spec.gx)
        oky = (iy + shift[1] >= 0) & (iy + shift[1] < spec.gy)
        okz = (iz + shift[2] >= 0) & (iz + shift[2] < spec.gz)
        ok = okx[:, None, None] & oky[None, :, None] & okz[None, None, :]
        ok = ok.reshape(spec.gx, spec.gy, spec.gz, *([1] * len(extra)))
        g = jnp.where(ok, g, jnp.zeros_like(g))
        return g.reshape(a.shape)

    # fin: roll the BASE lanes (the centre-voxel stats) then re-pack the
    # DIRECT7 neighbor lanes. The packed lanes are flat rolls of the base,
    # and flat rolls commute with the recentre roll — but recentre also
    # zeroes the newly exposed bands, and that zeroing would have to be
    # shifted per neighbor copy; re-packing after the roll is exact and
    # recentres are rare (margin crossings only).
    return VoxelGrid(
        origin=new_origin,
        stats=roll3(grid.stats),
        fin=pack_fin7(roll3(unpack_base(grid.fin, spec)), spec),
    )


# DIRECT lattice neighbor-offset tables (reference NeighborSearchMethod,
# pclomp/ndt_omp.h:52-57; getNeighborhoodAtPoint{,7,1},
# voxel_grid_covariance_omp_impl.hpp:373-441):
#   direct1  = centre voxel only
#   direct7  = centre + 6 face neighbors (reference default)
#   direct26 = full 3×3×3 cube — PCL's getAllNeighborCellIndices() is the 26
#              surrounding cells PLUS the zero column, i.e. 27 voxels
#   kdtree   = radiusSearch(resolution) over leaf centroids; a centroid
#              within `resolution` (euclidean) of the query lies within
#              `resolution` per-axis, hence inside the 27-cube — so KDTREE
#              is exactly the 27-cube masked to centroid distance < res
# numpy, not jnp: module import must never mint tracers if it happens
# inside a trace
import numpy as _np  # noqa: E402

_OFFSETS1 = _np.zeros((1, 3), _np.int32)
_OFFSETS7 = _np.array(
    [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
    _np.int32,
)
_OFFSETS27 = _np.stack(_np.meshgrid(*([_np.arange(-1, 2, dtype=_np.int32)] * 3),
                                    indexing="ij"), -1).reshape(-1, 3)

_MODE_OFFSETS = {
    "direct1": _OFFSETS1,
    "direct7": _OFFSETS7,
    "direct7_rows": _OFFSETS7,  # same semantics as direct7 via per-neighbor
    # row gathers (the pre-round-5 data path) — kept for A/B measurement of
    # the packed-row gather and as a bisection tool
    "direct26": _OFFSETS27,
    "kdtree": _OFFSETS27,
}


def lookup_neighbors(grid: VoxelGrid, spec: GridSpec, xyz: jnp.ndarray,
                     mode: str = "direct7"):
    """For each query point gather its DIRECT-mode voxel neighborhood.

    Returns (mean_world [N,M,3], icov6 [N,M,6], valid [N,M]) with
    M = 1 / 7 / 27 by mode (see _MODE_OFFSETS).

    direct7 (the default/hot mode) reads the 70-lane DIRECT7-packed row
    (pack_fin7): ONE latency-bound row gather per point instead of seven.
    The other modes gather per-neighbor rows from the base lanes."""
    idx3, _ = _voxel_index3(spec, grid.origin, xyz)
    offsets = _MODE_OFFSETS[mode]
    nidx3 = idx3[:, None, :] + offsets[None, :, :]
    inb = (
        (nidx3[..., 0] >= 0) & (nidx3[..., 0] < spec.gx)
        & (nidx3[..., 1] >= 0) & (nidx3[..., 1] < spec.gy)
        & (nidx3[..., 2] >= 0) & (nidx3[..., 2] < spec.gz)
    )
    px, py, pz = _padded_dims(spec)
    if mode == "direct7":
        # per-dim clip into the PADDED table: centres up to 1 voxel outside
        # the grid land on a border row whose packed neighbor blocks are the
        # correct interior rows (see pack_fin7); centres further out clip to
        # rows whose blocks are all inb-masked anyway
        idxp = jnp.clip(idx3 + 1, 0,
                        jnp.array([px - 1, py - 1, pz - 1], jnp.int32))
        flat = (idxp[..., 0] * py + idxp[..., 1]) * pz + idxp[..., 2]
        rows = grid.fin[flat].reshape(xyz.shape[0], 7, 10)     # [N,7,10]
    else:
        # per-neighbor row gather from the base lanes (padded layout);
        # per-dim clip keeps every flat index in range, inb masks the rest
        nidxp = jnp.clip(nidx3 + 1, 0,
                         jnp.array([px - 1, py - 1, pz - 1], jnp.int32))
        flat = (nidxp[..., 0] * py + nidxp[..., 1]) * pz + nidxp[..., 2]
        rows = grid.fin[..., :10][flat]                        # [N,M,10]
    mean_l = rows[..., 0:3]
    icov = rows[..., 3:9]
    valid = (rows[..., 9] > 0.0) & inb
    corner = grid.origin + nidx3.astype(jnp.float32) * spec.resolution
    mean_w = corner + mean_l
    if mode == "kdtree":
        # the reference's KDTREE mode builds a kd-tree over occupied-leaf
        # centroids and radius-searches with r = resolution
        # (voxel_grid_covariance_omp.h:278-279, ndt_omp_impl.hpp:233);
        # equivalent exact predicate: centroid within `resolution`
        d2 = jnp.sum((xyz[:, None, :] - mean_w) ** 2, -1)
        valid = valid & (d2 < spec.resolution ** 2)
    return mean_w, icov, valid


def lookup7(grid: VoxelGrid, spec: GridSpec, xyz: jnp.ndarray):
    """DIRECT7 neighborhood gather (the reference default mode)."""
    return lookup_neighbors(grid, spec, xyz, "direct7")


def occupied_count(grid: VoxelGrid) -> jnp.ndarray:
    return jnp.sum(grid.valid)


def grid_points(grid: VoxelGrid, spec: GridSpec):
    """All valid voxel means as a (means [V,3], mask [V]) pair — the map as a
    downsampled point cloud (used for visualization / map export)."""
    base = unpack_base(grid.fin, spec)
    idx = jnp.arange(spec.num_voxels)
    iz = idx % spec.gz
    iy = (idx // spec.gz) % spec.gy
    ix = idx // (spec.gy * spec.gz)
    corner = grid.origin + jnp.stack([ix, iy, iz], -1).astype(jnp.float32) * spec.resolution
    return corner + base[:, 0:3], base[:, 9] > 0.0
