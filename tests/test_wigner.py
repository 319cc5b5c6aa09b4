"""Group-axiom property tests for the regenerated Wigner-D matrices."""

import numpy as np
import jax.numpy as jnp
import pytest

from gta_tpu.geometry.wigner import (
    wigner_d_matrices,
    rotmat_to_zyz_euler,
    wigner_d_matrix,
    z_rot_mat,
)
from tests.conftest import random_rotation

MAX_DEGREE = 4
ATOL = 1e-4


def _ds(R, max_degree=MAX_DEGREE):
    return wigner_d_matrices(max_degree, jnp.asarray(R, dtype=jnp.float32))


def test_euler_roundtrip(rng):
    R = random_rotation(rng, 32)
    g1, g2, g3 = rotmat_to_zyz_euler(jnp.asarray(R, jnp.float32))

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        m = np.zeros((len(a), 3, 3))
        m[:, 0, 0], m[:, 0, 1] = c, -s
        m[:, 1, 0], m[:, 1, 1] = s, c
        m[:, 2, 2] = 1
        return m

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        m = np.zeros((len(a), 3, 3))
        m[:, 0, 0], m[:, 0, 2] = c, s
        m[:, 2, 0], m[:, 2, 2] = -s, c
        m[:, 1, 1] = 1
        return m

    R2 = rz(np.asarray(g3)) @ ry(np.asarray(g2)) @ rz(np.asarray(g1))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_identity(rng):
    R = np.tile(np.eye(3, dtype=np.float32)[None], (4, 1, 1))
    for l, D in enumerate(_ds(R)):
        np.testing.assert_allclose(np.asarray(D), np.tile(np.eye(2 * l + 1)[None], (4, 1, 1)), atol=ATOL)


def test_orthogonality(rng):
    R = random_rotation(rng, 16)
    for l, D in enumerate(_ds(R)):
        D = np.asarray(D, dtype=np.float64)
        gram = D @ np.swapaxes(D, -1, -2)
        np.testing.assert_allclose(gram, np.tile(np.eye(2 * l + 1)[None], (16, 1, 1)), atol=ATOL)


def test_homomorphism(rng):
    R1 = random_rotation(rng, 16)
    R2 = random_rotation(rng, 16)
    D1s, D2s, D12s = _ds(R1), _ds(R2), _ds(R1 @ R2)
    for l in range(MAX_DEGREE + 1):
        lhs = np.asarray(D12s[l], dtype=np.float64)
        rhs = np.asarray(D1s[l], dtype=np.float64) @ np.asarray(D2s[l], dtype=np.float64)
        np.testing.assert_allclose(lhs, rhs, atol=ATOL)


def test_inverse(rng):
    R = random_rotation(rng, 16)
    Ds = _ds(R)
    Dinvs = _ds(np.swapaxes(R, -1, -2))
    for l in range(MAX_DEGREE + 1):
        np.testing.assert_allclose(
            np.asarray(Dinvs[l]), np.swapaxes(np.asarray(Ds[l]), -1, -2), atol=ATOL
        )


def test_degree1_conjugate_to_rotation(rng):
    """D^1(R) = P R P^T with P the signed permutation (x,y,z)->(y,-z,-x).

    This pins the real-spherical-harmonics basis convention of our U matrix;
    any fixed orthogonal P gives a valid irrep, the test asserts ours is
    stable.
    """
    R = random_rotation(rng, 16)
    D1 = np.asarray(_ds(R, 1)[1], dtype=np.float64)
    P = np.array([[0.0, 1.0, 0.0], [0.0, 0.0, -1.0], [-1.0, 0.0, 0.0]])
    np.testing.assert_allclose(D1, P @ R @ P.T, atol=ATOL)


def test_z_rotation_structure():
    """D(Rz(theta)) must be the pure z-rotation rep for every degree."""
    theta = jnp.asarray([0.3, -1.2, 2.9], dtype=jnp.float32)
    c, s = np.cos(np.asarray(theta)), np.sin(np.asarray(theta))
    R = np.zeros((3, 3, 3), dtype=np.float32)
    R[:, 0, 0], R[:, 0, 1] = c, -s
    R[:, 1, 0], R[:, 1, 1] = s, c
    R[:, 2, 2] = 1
    Ds = _ds(R)
    for l in range(MAX_DEGREE + 1):
        np.testing.assert_allclose(
            np.asarray(Ds[l]), np.asarray(z_rot_mat(theta, l)), atol=ATOL
        )


def test_gimbal_lock(rng):
    """Rotations with R[2,2] = ±1 must not produce NaNs and stay homomorphic."""
    theta = np.array([0.4, 1.1], dtype=np.float32)
    c, s = np.cos(theta), np.sin(theta)
    Rz = np.zeros((2, 3, 3), dtype=np.float32)
    Rz[:, 0, 0], Rz[:, 0, 1] = c, -s
    Rz[:, 1, 0], Rz[:, 1, 1] = s, c
    Rz[:, 2, 2] = 1
    # R[2,2] = -1 case: rotate pi about x then z
    flip = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    Rflip = Rz @ flip[None]
    for R in (Rz, Rflip):
        for D in _ds(R, 2):
            assert np.isfinite(np.asarray(D)).all()
    # homomorphism through the flip
    D_a = _ds(Rz, 2)
    D_b = _ds(np.tile(flip[None], (2, 1, 1)), 2)
    D_ab = _ds(Rflip, 2)
    for l in range(3):
        np.testing.assert_allclose(
            np.asarray(D_ab[l]), np.asarray(D_a[l]) @ np.asarray(D_b[l]), atol=1e-3
        )


def test_first_call_inside_jit(rng):
    """Degree tables must be safe to build inside a jit trace (regression:
    lru-cached jnp constants created under trace leaked as tracers)."""
    from gta_tpu.geometry import wigner

    wigner._degree_tables.cache_clear()
    R = jnp.asarray(random_rotation(rng, 4), jnp.float32)

    import jax

    @jax.jit
    def f(R):
        return wigner_d_matrices(2, R)[2]

    a = np.asarray(f(R))
    b = np.asarray(f(R))  # second call reuses the now-populated cache
    np.testing.assert_allclose(a, b, atol=0)
    assert np.isfinite(a).all()


def test_high_degree_axioms(rng):
    """Degrees 5-8 (beyond any config's so3 setting) stay orthogonal and
    homomorphic — SURVEY 7.3 asks for validation 'ideally up to 8'.

    fp32 Jacobi-polynomial evaluation loses ~1 digit per degree, so the
    tolerance is looser than the low-degree tests but still catches any
    structural error (wrong table, basis mismatch, sign flip), which shows
    up at O(1).
    """
    R1 = random_rotation(rng, 8)
    R2 = random_rotation(rng, 8)
    D1s = _ds(R1, 8)
    D2s = _ds(R2, 8)
    D12s = _ds(R1 @ R2, 8)
    for l in range(5, 9):
        D = np.asarray(D1s[l], dtype=np.float64)
        n = 2 * l + 1
        gram = D @ np.swapaxes(D, -1, -2)
        np.testing.assert_allclose(gram, np.tile(np.eye(n)[None], (8, 1, 1)), atol=3e-3)
        lhs = np.asarray(D12s[l], dtype=np.float64)
        rhs = D @ np.asarray(D2s[l], dtype=np.float64)
        np.testing.assert_allclose(lhs, rhs, atol=5e-3)
