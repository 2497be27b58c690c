"""Packed reductions (utils/collectives.py): one all-gather per reduce call,
bit-identical to the per-leaf form (VERDICT r4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from xchu_slam_tpu.utils import collectives


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), ("data",))


def _per_leaf_allsum(x, axis):
    return jax.tree.map(lambda a: jnp.sum(jax.lax.all_gather(a, axis), 0), x)


def test_shard_allsum_bit_identical_to_per_leaf(rng):
    mesh = _mesh()
    L = jnp.float32(rng.normal())
    g = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    H = jnp.asarray(rng.normal(size=(8, 6, 6)).astype(np.float32))
    n = jnp.asarray(rng.integers(0, 1000, size=(8,)), jnp.int32)

    def body_packed(L, g, h, n):
        return collectives.shard_allsum(
            (L, g[0], h[0], n[0]), "data")

    def body_ref(L, g, h, n):
        return _per_leaf_allsum((L, g[0], h[0], n[0]), "data")

    specs = (P(), P("data"), P("data"), P("data"))
    fp = jax.jit(shard_map(body_packed, mesh=mesh, in_specs=specs,
                           out_specs=P(), check_vma=False))
    fr = jax.jit(shard_map(body_ref, mesh=mesh, in_specs=specs,
                           out_specs=P(), check_vma=False))
    out_p = fp(L, g, H, n)
    out_r = fr(L, g, H, n)
    for a, b in zip(jax.tree.leaves(out_p), jax.tree.leaves(out_r)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shard_allsum_int_leaf_exact():
    mesh = _mesh()
    # int counts ride the f32 packed vector; must round-trip exactly
    counts = jnp.asarray(np.full(8, (1 << 20) + 3, np.int32))
    extra = jnp.asarray(np.ones((8, 2), np.float32))

    def body(c, e):
        return collectives.shard_allsum((c[0], e[0]), "data")

    f = jax.jit(shard_map(body, mesh=mesh, in_specs=(P("data"), P("data")),
                          out_specs=P(), check_vma=False))
    c_sum, e_sum = f(counts, extra)
    assert c_sum.dtype == jnp.int32
    assert int(c_sum) == 8 * ((1 << 20) + 3)
    np.testing.assert_allclose(np.asarray(e_sum), [8.0, 8.0])


def test_shard_bcast0_takes_rank0(rng):
    mesh = _mesh()
    g = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    H = jnp.asarray(rng.normal(size=(8, 6, 6)).astype(np.float32))

    def body(g, h):
        return collectives.shard_bcast0((g[0], h[0]), "data")

    f = jax.jit(shard_map(body, mesh=mesh, in_specs=(P("data"), P("data")),
                          out_specs=P(), check_vma=False))
    g0, H0 = f(g, H)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g[0]))
    np.testing.assert_array_equal(np.asarray(H0), np.asarray(H[0]))


def test_packed_reduction_is_one_collective():
    """The packed form must lower to a single all-gather; the per-leaf form
    lowers to one per leaf (the count VERDICT r4 bounds ICI scaling by)."""
    mesh = _mesh()
    args = (jnp.float32(1.0), jnp.ones((6,), jnp.float32),
            jnp.ones((6, 6), jnp.float32))

    def packed(*xs):
        return collectives.shard_allsum(xs, "data")

    def per_leaf(*xs):
        return _per_leaf_allsum(xs, "data")

    def count_ag(fn):
        f = jax.jit(shard_map(fn, mesh=mesh, in_specs=(P(),) * 3,
                              out_specs=P(), check_vma=False))
        txt = f.lower(*args).compile().as_text()
        return txt.count("all-gather-start") or txt.count("all-gather(")

    assert count_ag(packed) == 1
    assert count_ag(per_leaf) == 3
