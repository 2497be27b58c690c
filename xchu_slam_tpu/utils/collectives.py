"""Packed deterministic cross-device reductions.

One `reduce` call = ONE executed collective, regardless of how many arrays it
carries: all leaves are flattened, concatenated into a single f32 vector,
all-gathered once, summed over the device axis in fixed rank order, and
unpacked. The reference reduces all of a thread's partials (score, gradient,
Hessian) in ONE serial pass over the per-thread partial sums
(`ndt_omp_impl.hpp:276-280`); this is that pass as a single ICI collective.

Why all-gather + ordered sum instead of `psum`: a plain psum may reduce in
per-rank order, and any float skew in values that feed `while_loop`/`cond`
predicates would diverge trip counts across ranks and deadlock the
collectives inside the loop bodies. Summing the gathered [D, n] block along
axis 0 gives every rank bit-identical totals.

Why packing matters (VERDICT r4): on real ICI the scaling bound is
(executed collectives per step) x (per-collective latency) + bytes / ICI
bandwidth — and these reductions are tiny (a Newton iteration's (L, g, H) is
43 floats), so latency dominates. Packing each reduction site into one
collective roughly halves the per-step count (measured in bench phase4).

Integer leaves ride the packed f32 vector: exact for |value| < 2^24 (the
leaves are point/match counts, far below), and the unpack casts back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unpack(vec, leaves, treedef):
    out, off = [], 0
    for leaf in leaves:
        n = leaf.size
        out.append(vec[off:off + n].reshape(leaf.shape).astype(leaf.dtype))
        off += n
    return jax.tree.unflatten(treedef, out)


def shard_allsum(x, axis: str):
    """Deterministic cross-device sum of a pytree via ONE packed all-gather.

    Bit-identical to the per-leaf form: each output element is the sum of the
    same D per-rank values in the same rank order; packing only changes how
    many collectives carry them."""
    leaves, treedef = jax.tree.flatten(x)
    if not leaves:
        return x
    if len(leaves) == 1:
        s = jnp.sum(jax.lax.all_gather(leaves[0], axis), 0)
        return jax.tree.unflatten(treedef, [s.astype(leaves[0].dtype)])
    flat = jnp.concatenate(
        [jnp.ravel(leaf).astype(jnp.float32) for leaf in leaves])
    tot = jnp.sum(jax.lax.all_gather(flat, axis), 0)
    return _unpack(tot, leaves, treedef)


def shard_bcast0(x, axis: str):
    """Broadcast rank 0's pytree to every rank via ONE packed all-gather.

    Used to force control-flow inputs bit-identical across SPMD ranks when
    the values were produced by non-deterministic per-rank arithmetic (e.g.
    reverse-mode transposes of in-loss collectives)."""
    leaves, treedef = jax.tree.flatten(x)
    if not leaves:
        return x
    if len(leaves) == 1:
        r0 = jax.lax.all_gather(leaves[0], axis)[0]
        return jax.tree.unflatten(treedef, [r0.astype(leaves[0].dtype)])
    flat = jnp.concatenate(
        [jnp.ravel(leaf).astype(jnp.float32) for leaf in leaves])
    row0 = jax.lax.all_gather(flat, axis)[0]
    return _unpack(row0, leaves, treedef)
