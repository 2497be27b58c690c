"""Pallas TPU kernel: brute-force nearest neighbor with fused argmin.

The ICP correspondence search (reference `pcl::IterativeClosestPoint`'s
kd-tree query, here `ops/icp.py::_nearest`) is the hot op of loop
verification: for each source point, the squared distance to every target
point, reduced to (argmin, min). The XLA formulation materializes a
[chunk, M] distance block in HBM per step; this kernel keeps everything in
VMEM — the distance tile comes off the MXU and is reduced to a running
(min, argmin) register pair before the next tile is computed, so HBM traffic
is exactly the inputs + [N] outputs.

Grid: one program per source tile; the target loop runs inside the kernel
over VMEM-resident target tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SRC_TILE = 1024  # 1-D outputs must match XLA's s32/f32 T(1024) tiling
TGT_TILE = 2048


def _nn_kernel(src_ref, tgt_ref, tgtsq_ref, mask_ref, idx_ref, d2_ref):
    """src [S,3] VMEM; tgt [M,3] VMEM; tgtsq [M]; mask [M] (1=valid).
    Outputs per source point: idx [S] int32, d2 [S] f32 (exact)."""
    src = src_ref[:]                                   # [S,3]
    src_sq = jnp.sum(src * src, axis=-1)               # [S]
    M = tgt_ref.shape[0]
    n_tiles = M // TGT_TILE

    def body(t, carry):
        best_d2, best_idx = carry
        tgt = tgt_ref[pl.ds(t * TGT_TILE, TGT_TILE), :]          # [T,3]
        tsq = tgtsq_ref[pl.ds(t * TGT_TILE, TGT_TILE)]           # [T]
        msk = mask_ref[pl.ds(t * TGT_TILE, TGT_TILE)]            # [T]
        # cross term on the MXU; HIGHEST (3-pass bf16 ≈ f32) — at submap
        # coordinate scales (±100 m) a single bf16 pass mispicks neighbors
        # by metres, which corrupts the fitness statistic
        cross = jax.lax.dot_general(
            src, tgt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                  # [S,T]
        d2 = src_sq[:, None] + tsq[None, :] - 2.0 * cross
        d2 = jnp.where(msk[None, :] > 0, d2, 3.4e38)
        tile_min = jnp.min(d2, axis=1)                            # [S]
        tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + t * TGT_TILE
        better = tile_min < best_d2
        return (jnp.where(better, tile_min, best_d2),
                jnp.where(better, tile_arg, best_idx))

    init = (jnp.full((SRC_TILE,), 3.4e38, jnp.float32),
            jnp.zeros((SRC_TILE,), jnp.int32))
    best_d2, best_idx = jax.lax.fori_loop(0, n_tiles, body, init)
    idx_ref[:] = best_idx
    d2_ref[:] = jnp.maximum(best_d2, 0.0)


def nearest_neighbor(src: jnp.ndarray, tgt: jnp.ndarray,
                     tgt_mask: jnp.ndarray):
    """For each src point [N,3]: (index of nearest valid tgt point [N],
    exact squared distance [N]). N must be a multiple of 1024 and len(tgt) a
    multiple of 2048 (pipeline capacities are powers of two)."""
    N = src.shape[0]
    M = tgt.shape[0]
    assert N % SRC_TILE == 0 and M % TGT_TILE == 0, (N, M)
    tgtsq = jnp.sum(tgt * tgt, axis=-1)
    maskf = tgt_mask.astype(jnp.float32)

    interpret = jax.default_backend() not in ("tpu",)
    idx, _d2_mxu = pl.pallas_call(
        _nn_kernel,
        grid=(N // SRC_TILE,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((SRC_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((M,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((SRC_TILE,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SRC_TILE,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N,), jnp.int32),
            jax.ShapeDtypeStruct((N,), jnp.float32),
        ],
    )(src, tgt, tgtsq, maskf)

    nn = tgt[idx]
    d2_exact = jnp.sum((src - nn) ** 2, axis=-1)
    d2_exact = jnp.where(tgt_mask[idx], d2_exact, 1e30)
    return idx, d2_exact
