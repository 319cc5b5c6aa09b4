"""Real Wigner-D matrices (orthogonal SO(3) irreps) — self-contained.

The reference loads precomputed `J_dense.pt` tables (wigner_d.py:8-9, file
MISSING from its snapshot) and factorizes D = Z(g3) J Z(g2) J Z(g1). We
regenerate everything from first principles instead:

  1. Wigner small-d matrices d^l(beta) via the closed-form factorial sum,
     expressed as a coefficient tensor over monomials
     cos(beta/2)^p * sin(beta/2)^(2l-p)  (p + q = 2l always).
  2. Basis change to *real* spherical harmonics: B(beta) = U d(beta) U^H is
     real; we pre-contract U into the coefficient tensor once (numpy,
     complex128) so runtime JAX math is entirely real.
  3. D_real(R) = Z(g3) @ B(g2) @ Z(g1) where (g1, g2, g3) are ZYZ Euler
     angles with R = Rz(g3) Ry(g2) Rz(g1) (same convention as reference
     wigner_d.py:39-49), and Z(a) is the real z-rotation rep, built with
     static one-hot bases for jit-friendliness.

Gimbal-lock handling uses jnp.where masks (jit-safe), mirroring reference
wigner_d.py:44-48. D matrices are consumed under stop_gradient by GTA
attention (reference detaches them, gta.py:194-197).

Validated properties (tests/test_wigner.py): realness, orthogonality,
homomorphism D(R1 R2) = D(R1) D(R2), D(I) = I, and degree-1 conjugacy
D^1(R) = P R P^T with P the (x,y,z)->(y,z,x) permutation.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

EPS = 1e-5


def _small_d_coeffs(l: int) -> np.ndarray:
    """Coefficient tensor W[a, b, p] (complex basis, m = -l..l ordering):

    d^l_{m'm}(beta) = sum_p W[l+m', l+m, p] cos(beta/2)^p sin(beta/2)^(2l-p)
    """
    n = 2 * l + 1
    W = np.zeros((n, n, n), dtype=np.float64)
    f = math.factorial
    for mp in range(-l, l + 1):  # m'
        for m in range(-l, l + 1):
            pref = math.sqrt(f(l + mp) * f(l - mp) * f(l + m) * f(l - m))
            s_lo = max(0, m - mp)
            s_hi = min(l + m, l - mp)
            for s in range(s_lo, s_hi + 1):
                p = 2 * l + m - mp - 2 * s  # cos power
                q = mp - m + 2 * s  # sin power; p + q == 2l
                c = ((-1.0) ** (mp - m + s)) * pref / (
                    f(l + m - s) * f(s) * f(mp - m + s) * f(l - mp - s)
                )
                W[l + mp, l + m, p] += c
    return W


def _real_basis_U(l: int) -> np.ndarray:
    """Unitary complex->real SH change of basis, rows = real mu, cols = complex m."""
    n = 2 * l + 1
    U = np.zeros((n, n), dtype=np.complex128)
    U[l, l] = 1.0
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    for m in range(1, l + 1):
        U[l + m, l + m] = ((-1.0) ** m) * inv_sqrt2
        U[l + m, l - m] = inv_sqrt2
        U[l - m, l + m] = -1j * ((-1.0) ** m) * inv_sqrt2
        U[l - m, l - m] = 1j * inv_sqrt2
    return U


@lru_cache(maxsize=None)
def _degree_tables(l: int):
    """Precompute static real tables for degree l.

    Returns (Wr [n,n,n], Ediag [n,n,n], Eanti [n,n,n], ms [n], zsign):
      B(beta)  = einsum('abp,...p->...ab', Wr, basis(beta))
      Z(alpha) = einsum('...a,aij->...ij', cos(m*alpha), Ediag)
               + zsign * einsum('...a,aij->...ij', sin(m*alpha), Eanti)
    """
    n = 2 * l + 1
    W = _small_d_coeffs(l)
    U = _real_basis_U(l)
    # B(beta) = U d(beta) U^H  =>  Wr[a,b,p] = Re( U W[:,:,p] U^H )
    Wr = np.einsum("ac,cdp,bd->abp", U, W.astype(np.complex128), U.conj()).real
    # Verify realness of the conjugated tensor.
    im = np.abs(
        np.einsum("ac,cdp,bd->abp", U, W.astype(np.complex128), U.conj()).imag
    ).max()
    assert im < 1e-10, f"real-basis Wigner-d not real at degree {l}: imag={im}"

    ms = np.arange(-l, l + 1, dtype=np.float64)  # frequency per basis index
    Ediag = np.zeros((n, n, n))
    Eanti = np.zeros((n, n, n))
    for a in range(n):
        Ediag[a, a, a] = 1.0
        Eanti[a, a, n - 1 - a] = 1.0

    # Determine the anti-diagonal sign by comparing against U diag(e^{-im a}) U^H
    alpha = 0.7
    Zc = np.diag(np.exp(-1j * np.arange(-l, l + 1) * alpha))
    Zr = (U @ Zc @ U.conj().T)
    assert np.abs(Zr.imag).max() < 1e-10
    Zr = Zr.real
    cand = np.einsum("a,aij->ij", np.cos(ms * alpha), Ediag)
    anti = np.einsum("a,aij->ij", np.sin(ms * alpha), Eanti)
    if np.allclose(Zr, cand + anti, atol=1e-9):
        zsign = 1.0
    elif np.allclose(Zr, cand - anti, atol=1e-9):
        zsign = -1.0
    else:
        raise AssertionError(f"z-rotation structure mismatch at degree {l}")
    # Cache NUMPY arrays only: jnp constants created during a jit trace are
    # trace-tied tracers in recent JAX and must not outlive the trace
    # (caching one raised UnexpectedTracerError on the first SO(3) user).
    return (
        np.asarray(Wr, dtype=np.float32),
        np.asarray(Ediag, dtype=np.float32),
        np.asarray(Eanti, dtype=np.float32),
        np.asarray(ms, dtype=np.float32),
        zsign,
    )


_PREC = jax.lax.Precision.HIGHEST  # tiny matrices; keep full fp32 on TPU


def z_rot_mat(angle: jnp.ndarray, l: int) -> jnp.ndarray:
    """Real z-rotation representation matrix, [..., 2l+1, 2l+1]."""
    _, Ediag, Eanti, ms, zsign = _degree_tables(l)
    ms = jnp.asarray(ms, dtype=angle.dtype)
    Ediag = jnp.asarray(Ediag)
    Eanti = jnp.asarray(Eanti)
    th = angle[..., None] * ms  # [..., n]
    return jnp.einsum("...a,aij->...ij", jnp.cos(th), Ediag, precision=_PREC) + zsign * jnp.einsum(
        "...a,aij->...ij", jnp.sin(th), Eanti, precision=_PREC
    )


def _y_rot_real(beta: jnp.ndarray, l: int) -> jnp.ndarray:
    """Real rep of Ry(beta): B(beta) = U d^l(beta) U^H, [..., 2l+1, 2l+1]."""
    Wr = jnp.asarray(_degree_tables(l)[0])
    ch = jnp.cos(beta / 2.0)
    sh = jnp.sin(beta / 2.0)
    basis = jnp.stack([(ch**p) * (sh ** (2 * l - p)) for p in range(2 * l + 1)], -1)
    return jnp.einsum("abp,...p->...ab", Wr.astype(beta.dtype), basis, precision=_PREC)


def wigner_d_matrix(l: int, g1: jnp.ndarray, g2: jnp.ndarray, g3: jnp.ndarray) -> jnp.ndarray:
    """D^l for ZYZ Euler angles with R = Rz(g3) Ry(g2) Rz(g1): Z(g3) B(g2) Z(g1)."""
    if l == 0:
        return jnp.ones((*g1.shape, 1, 1), dtype=g1.dtype)
    return jnp.matmul(
        jnp.matmul(z_rot_mat(g3, l), _y_rot_real(g2, l), precision=_PREC),
        z_rot_mat(g1, l),
        precision=_PREC,
    )


def rotmat_to_zyz_euler(R: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Extract (g1, g2, g3) with R = Rz(g3) Ry(g2) Rz(g1), gimbal-lock safe.

    Same convention and masking as reference wigner_d.py:39-49, but with
    jnp.where (jit-safe) instead of float-mask arithmetic.
    """
    g2 = jnp.arctan2(jnp.sqrt(R[..., 0, 2] ** 2 + R[..., 1, 2] ** 2), R[..., 2, 2])
    g1 = jnp.arctan2(R[..., 2, 1], -R[..., 2, 0])
    g3 = jnp.arctan2(R[..., 1, 2], R[..., 0, 2])
    top = jnp.abs(R[..., 2, 2] - 1.0) < EPS  # g2 ~ 0
    bottom = jnp.abs(R[..., 2, 2] + 1.0) < EPS  # g2 ~ pi
    g1 = jnp.where(top, jnp.arctan2(R[..., 1, 0], R[..., 0, 0]), g1)
    # Note: the reference uses atan2(-R[1,0], -R[0,0]) here (wigner_d.py:47),
    # which contradicts its own ZYZ convention (sin sign flips); with g2 = pi
    # and g3 = 0, R = Ry(pi) Rz(g1) requires g1 = atan2(R[1,0], -R[0,0]).
    # We keep the correct branch — it only differs on the measure-zero
    # g2 = pi set and is required for the homomorphism property to hold there.
    g1 = jnp.where(bottom, jnp.arctan2(R[..., 1, 0], -R[..., 0, 0]), g1)
    g3 = jnp.where(top | bottom, jnp.zeros_like(g3), g3)
    return g1, g2, g3


def wigner_d_matrices(max_degree: int, R: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Tuple of D^l(R) for l = 0..max_degree, each [..., 2l+1, 2l+1].

    Mirrors reference rotmat_to_wigner_d_matrices (wigner_d.py:52-58);
    callers typically drop degree 0.
    """
    g1, g2, g3 = rotmat_to_zyz_euler(R)
    return tuple(wigner_d_matrix(l, g1, g2, g3) for l in range(max_degree + 1))
