import jax
import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.ops import ndt, voxel_map as vm
from xchu_slam_tpu.utils import se3

GSPEC = vm.GridSpec(gx=48, gy=48, gz=16, resolution=2.0, min_points=6,
                    eig_inflation=0.01)
NSPEC = ndt.NdtSpec(max_iterations=40)


def make_world(rng, n=6000):
    """Structured scene: ground plane + 2 walls + scattered pillars."""
    n_g = n // 2
    n_w = n // 4
    ground = np.c_[rng.uniform(-35, 35, (n_g, 2)), rng.normal(0, 0.03, n_g)]
    wall1 = np.c_[rng.uniform(-35, 35, n_w),
                  np.full(n_w, 14.0) + rng.normal(0, 0.05, n_w),
                  rng.uniform(0, 4, n_w)]
    wall2 = np.c_[np.full(n - n_g - n_w, -12.0) + rng.normal(0, 0.05, n - n_g - n_w),
                  rng.uniform(-35, 35, n - n_g - n_w),
                  rng.uniform(0, 4, n - n_g - n_w)]
    return np.vstack([ground, wall1, wall2]).astype(np.float32)


def build_grid(world):
    grid = vm.make_grid(GSPEC, vm.centered_origin(GSPEC, np.zeros(3)))
    grid = vm.insert_points(grid, jnp.asarray(world), jnp.ones(len(world), bool), GSPEC)
    return vm.finalize(grid, GSPEC)


def test_gauss_constants():
    d1, d2 = ndt.gauss_constants(0.55, 2.0)
    assert d1 < 0 and d2 > 0
    assert np.isfinite(d1) and np.isfinite(d2)


def test_loss_decreases_toward_identity(rng):
    world = make_world(rng)
    grid = build_grid(world)
    src = jnp.asarray(world[rng.choice(len(world), 2000, replace=False)])
    mask = jnp.ones(2000, bool)
    d1, d2 = ndt.gauss_constants(0.55, 2.0)
    l0 = float(ndt.ndt_loss(jnp.zeros(6), src, mask, grid, GSPEC, d1, d2))
    l_off = float(ndt.ndt_loss(jnp.array([0.8, 0.5, 0.0, 0, 0, 0.05]),
                               src, mask, grid, GSPEC, d1, d2))
    assert l0 < l_off  # identity (true) pose scores better (lower)


def test_align_recovers_perturbation(rng):
    world = make_world(rng)
    grid = build_grid(world)
    true_pose = np.array([0.4, -0.3, 0.05, 0.01, -0.01, 0.04], np.float32)
    # source scan = world points observed from `true_pose`⁻¹ (so that
    # transforming by true_pose re-aligns them with the map)
    T = np.asarray(se3.pose_to_matrix(jnp.asarray(true_pose)))
    sel = world[rng.choice(len(world), 2000, replace=False)]
    src_np = (np.linalg.inv(T)[:3, :3] @ sel.T).T + np.linalg.inv(T)[:3, 3]
    src = jnp.asarray(src_np.astype(np.float32))
    mask = jnp.ones(2000, bool)

    res = ndt.align(grid, src, mask, jnp.zeros(6), GSPEC, NSPEC)
    pose = np.asarray(res.pose)
    assert bool(res.converged) or int(res.iterations) == NSPEC.max_iterations
    np.testing.assert_allclose(pose[:2], true_pose[:2], atol=0.05)
    np.testing.assert_allclose(pose[2], true_pose[2], atol=0.12)  # z weakly
    # constrained by a thin ground plane in 2 m voxels
    np.testing.assert_allclose(pose[3:], true_pose[3:], atol=0.015)
    assert float(res.matched_frac) > 0.5


def test_align_with_noise_and_partial_overlap(rng):
    world = make_world(rng)
    grid = build_grid(world)
    true_pose = np.array([0.6, 0.2, 0.0, 0.0, 0.0, -0.03], np.float32)
    T = np.asarray(se3.pose_to_matrix(jnp.asarray(true_pose)))
    sel = world[rng.choice(len(world), 3000, replace=False)]
    src_np = (np.linalg.inv(T)[:3, :3] @ sel.T).T + np.linalg.inv(T)[:3, 3]
    src_np += rng.normal(0, 0.02, src_np.shape)
    mask = np.ones(3000, bool)
    mask[2500:] = False  # padding tail must be ignored
    src_np[2500:] = 1e6  # poison padded entries
    res = ndt.align(grid, jnp.asarray(src_np.astype(np.float32)),
                    jnp.asarray(mask), jnp.zeros(6), GSPEC, NSPEC)
    pose = np.asarray(res.pose)
    np.testing.assert_allclose(pose[:2], true_pose[:2], atol=0.1)
    np.testing.assert_allclose(pose[2], true_pose[2], atol=0.15)
    np.testing.assert_allclose(pose[3:], true_pose[3:], atol=0.02)


def test_align_from_good_guess_is_stable(rng):
    """Aligning from the true pose must stay there."""
    world = make_world(rng)
    grid = build_grid(world)
    src = jnp.asarray(world[rng.choice(len(world), 1500, replace=False)])
    res = ndt.align(grid, src, jnp.ones(1500, bool), jnp.zeros(6), GSPEC, NSPEC)
    pose = np.asarray(res.pose)
    np.testing.assert_allclose(pose[[0, 1, 3, 4, 5]], np.zeros(5), atol=0.02)
    np.testing.assert_allclose(pose[2], 0.0, atol=0.06)  # z: thin plane bias
    # fitness is sq-dist to voxel MEANS (2 m cells), not nearest raw point
    assert float(res.fitness) < 3.0


def test_align_empty_source_is_safe():
    world = np.zeros((10, 3), np.float32)
    grid = vm.make_grid(GSPEC, vm.centered_origin(GSPEC, np.zeros(3)))
    grid = vm.finalize(grid, GSPEC)
    src = jnp.zeros((100, 3))
    res = ndt.align(grid, src, jnp.zeros(100, bool), jnp.zeros(6), GSPEC, NSPEC)
    assert np.all(np.isfinite(np.asarray(res.pose)))


def test_align_jit_cache(rng):
    """Second call with same shapes must not retrace (sanity on static args)."""
    world = make_world(rng)
    grid = build_grid(world)
    src = jnp.asarray(world[:1000])
    mask = jnp.ones(1000, bool)
    r1 = ndt.align(grid, src, mask, jnp.zeros(6), GSPEC, NSPEC)
    r2 = ndt.align(grid, src, mask, jnp.asarray(r1.pose), GSPEC, NSPEC)
    assert np.all(np.isfinite(np.asarray(r2.pose)))
