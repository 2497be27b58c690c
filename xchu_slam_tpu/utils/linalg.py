"""Small-matrix linear algebra, vmappable and TPU-friendly.

Closed-form symmetric 3×3 eigendecomposition — the TPU-native analogue of the
reference's `cpu::SymmetricEigensolver3x3` (`ndt_cpu/SymmetricEigenSolver.h:11-38`)
and Eigen's SelfAdjointEigenSolver use in `voxel_grid_covariance_omp_impl.hpp:343`.
Operating on packed upper-triangular symmetric storage (xx,xy,xz,yy,yz,zz) to keep
the voxel-grid tensors compact.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def sym6_to_mat(s: jnp.ndarray) -> jnp.ndarray:
    """packed [..., 6] (xx,xy,xz,yy,yz,zz) → [..., 3, 3]."""
    xx, xy, xz, yy, yz, zz = (s[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1),
        ],
        -2,
    )


def mat_to_sym6(M: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [M[..., 0, 0], M[..., 0, 1], M[..., 0, 2],
         M[..., 1, 1], M[..., 1, 2], M[..., 2, 2]],
        -1,
    )


def sym6_matvec(s: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Packed symmetric [.,6] times vector [.,3] without materializing 3×3."""
    xx, xy, xz, yy, yz, zz = (s[..., i] for i in range(6))
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [xx * x + xy * y + xz * z,
         xy * x + yy * y + yz * z,
         xz * x + yz * y + zz * z],
        -1,
    )


def sym_eigvals3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric [..., 3, 3], ascending. Trigonometric method
    (Smith 1961), fully branch-free."""
    q = (A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]) / 3.0
    A_q = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(A_q * A_q, axis=(-1, -2)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    B = A_q / p[..., None, None]
    detB = (
        B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
        - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
        + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
    )
    r = jnp.clip(detB * 0.5, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam2 = q + 2.0 * p * jnp.cos(phi)                      # largest
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    lam1 = 3.0 * q - lam0 - lam2
    # degenerate (p≈0): all eigenvalues = q
    iso = p2 < _EPS
    lam0 = jnp.where(iso, q, lam0)
    lam1 = jnp.where(iso, q, lam1)
    lam2 = jnp.where(iso, q, lam2)
    return jnp.stack([lam0, lam1, lam2], -1)


def inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of [..., 3, 3] via adjugate."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _EPS, jnp.inf, det)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        -2,
    )
    return adj * inv_det[..., None, None]


def smallest_eigvec3(A: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric [..., 3, 3].

    Branch-free: the null direction of (A − λ₀I) is recovered as the largest
    cross product between its rows (rows span the orthogonal complement)."""
    lam0 = sym_eigvals3(A)[..., 0]
    B = A - lam0[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    cands = jnp.stack([c01, c02, c12], -2)
    norms = jnp.linalg.norm(cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1), -2)[..., 0, :]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # fully degenerate (isotropic) matrix → any direction; pick +z
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], A.dtype), v.shape)
    return jnp.where(n > 1e-12, v / jnp.maximum(n, 1e-12), fallback)


def inflate_and_invert_cov(cov: jnp.ndarray, inflation: float) -> jnp.ndarray:
    """NDT covariance conditioning (reference `voxel_grid_covariance_omp_impl.hpp:343-364`):
    floor small eigenvalues at `inflation`·λ_max, return the inverse.

    Implemented without an eigenvector solve: Σ' = Σ + shift where the shift is
    applied in the eigenbasis. We compute eigenvalues closed-form, and when any
    λ < floor we reconstruct via the spectral decomposition obtained from
    (Σ - λI) column cross-products — but the numerically robust and cheap
    branch-free route is: Σ' = Σ + max(0, floor - λ_min)·I, which preserves
    eigenvectors and raises only the deficient directions by at most the floor.
    This is a deliberate TPU-friendly variant; it matches the reference's
    conditioning intent (bounded condition number ≤ 1/inflation·~) and is
    validated in tests for condition-number bounds.
    """
    lam = sym_eigvals3(cov)
    lam_max = lam[..., 2]
    floor = inflation * lam_max
    bump = jnp.maximum(0.0, floor - lam[..., 0])
    cov_inflated = cov + bump[..., None, None] * jnp.eye(3, dtype=cov.dtype)
    return inv3(cov_inflated)
