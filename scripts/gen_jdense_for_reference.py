"""Regenerate the reference's missing `J_dense.pt` Wigner-J tables.

The reference factorizes real Wigner-D matrices as

    D^l(g1, g2, g3) = Z(g3) @ J_l @ Z(g2) @ J_l @ Z(g1)      (wigner_d.py:28-35)

where Z is its real z-rotation rep (wigner_d.py:16-25, descending
frequencies l..-l) and J_l is a precomputed involution loaded from
`J_dense.pt` (wigner_d.py:8-9) — a file MISSING from the snapshot.

Our framework never uses J tables (gta_tpu/geometry/wigner.py builds the
middle factor B(beta) = U d^l(beta) U^H directly), but the tables are
recoverable from it in closed form: J_l is the rep matrix of the proper
rotation that swaps the y and z axes,

    R_J = [[-1, 0, 0], [0, 0, 1], [0, 1, 0]]   (pi about (0,1,1)/sqrt(2)),

because R_J Rz(beta) R_J^{-1} = Ry(beta), so D(R_J) conjugates z-rotation
reps into y-rotation reps, and R_J^2 = I makes it an involution.

One basis subtlety (verified numerically at degree 1): our real-SH basis
differs from the reference's by S_l = diag(-1 for m<0, +1 for m>=0) — our
z-rotation rep is ref_z(-beta), and our degree-1 D is S (P R P^T) S with P
the (x,y,z)->(y,z,x) relabeling, while the reference's z_rot
(wigner_d.py:16-25) IS P Rz(beta) P^T exactly. Hence the exported table is

    J'_l = S_l @ D_l(R_J) @ S_l,

which makes the reference's product a genuine homomorphism D'(R) =
S D(R) S whose restriction to z-rotations equals the reference's own
z_rot — self-consistent with its Euler extraction (wigner_d.py:39-49).

Writing J_dense.pt makes `/root/reference/source/...` importable (the
torch.load happens at module import), unlocking cross-framework parity
tests including the so3 configs the snapshot could never run.

Usage:  python scripts/gen_jdense_for_reference.py [outpath] [max_degree]
Library: `generate_jdense(max_degree)` -> list[np.ndarray];
         `write_jdense(path, max_degree)` (torch.save format).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gta_tpu.geometry.wigner import _degree_tables, _real_basis_U, _small_d_coeffs


def _ref_z_rot(angle: float, l: int) -> np.ndarray:
    """The reference's z-rotation rep (wigner_d.py:16-25): descending
    frequencies l..-l; sin on the anti-diagonal, cos on the diagonal."""
    n = 2 * l + 1
    m = np.zeros((n, n))
    freqs = np.arange(l, -l - 1, -1, dtype=np.float64)
    inds = np.arange(n)
    m[inds, n - 1 - inds] = np.sin(freqs * angle)
    m[inds, inds] = np.cos(freqs * angle)
    return m


def _y_rot_real_np(beta: float, l: int) -> np.ndarray:
    """float64 B(beta) = U d^l(beta) U^H (same math as wigner._y_rot_real,
    but double precision for the solve)."""
    W = _small_d_coeffs(l).astype(np.complex128)
    U = _real_basis_U(l)
    Wr = np.einsum("ac,cdp,bd->abp", U, W, U.conj()).real
    ch, sh = np.cos(beta / 2.0), np.sin(beta / 2.0)
    basis = np.array([(ch**p) * (sh ** (2 * l - p)) for p in range(2 * l + 1)])
    return np.einsum("abp,p->ab", Wr, basis)


def _my_z_rot(angle: float, l: int) -> np.ndarray:
    """float64 z-rotation rep in OUR basis (ascending m; anti +sin(m a))."""
    n = 2 * l + 1
    m = np.zeros((n, n))
    ms = np.arange(-l, l + 1, dtype=np.float64)
    inds = np.arange(n)
    m[inds, inds] = np.cos(ms * angle)
    m[inds, n - 1 - inds] += np.sin(ms * angle)
    # m = 0 row got cos+sin on the same (diagonal) entry; fix it
    m[l, l] = 1.0
    return m


def _sign_S(l: int) -> np.ndarray:
    """Our-basis -> reference-basis diagonal sign change (flip m<0)."""
    s = np.ones(2 * l + 1)
    s[:l] = -1.0
    return np.diag(s)


def _solve_J(l: int) -> np.ndarray:
    """J'_l = S D_l(R_J) S in float64, validated as an involutive
    intertwiner for the reference's z_rot convention."""
    if l == 0:
        return np.ones((1, 1))
    n = 2 * l + 1
    eye = np.eye(n)
    # D_l(R_J) in our basis: R_J has ZYZ Euler angles with
    # R_J = Rz(g3) Ry(g2) Rz(g1); from the extraction formulas:
    # g2 = atan2(sqrt(R02^2+R12^2), R22) = atan2(1, 0) = pi/2
    # g1 = atan2(R21, -R20) = atan2(1, 0) = pi/2
    # g3 = atan2(R12, R02) = atan2(1, 0) = pi/2
    g = np.pi / 2.0
    D_RJ = _my_z_rot(g, l) @ _y_rot_real_np(g, l) @ _my_z_rot(g, l)
    S = _sign_S(l)
    J = S @ D_RJ @ S
    # Validate: orthogonal involution; conjugates the reference's z_rot
    # into the reference-basis y-rotation rep S B(beta) S.
    assert np.allclose(J @ J.T, eye, atol=1e-12), f"J not orthogonal at degree {l}"
    assert np.allclose(J @ J, eye, atol=1e-12), f"J not an involution at degree {l}"
    for beta in (0.123, 2.2, -1.4):
        want = S @ _y_rot_real_np(beta, l) @ S
        got = J @ _ref_z_rot(beta, l) @ J
        assert np.allclose(got, want, atol=1e-12), (
            f"conjugation check failed at degree {l}, beta={beta}: "
            f"max|d|={np.abs(got - want).max():.2e}"
        )
    return J


def generate_jdense(max_degree: int = 8) -> list:
    return [_solve_J(l) for l in range(max_degree + 1)]


def _verify_against_ours(Js: list) -> float:
    """Full-product check on random rotations: the reference formula with
    our exported J tables must equal S @ D_ours @ S (the fixed basis change
    between the two frameworks), and must itself be a homomorphism."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gta_tpu.geometry.wigner import wigner_d_matrices

    rng = np.random.default_rng(0)
    A = rng.standard_normal((64, 3, 3))
    Q, _ = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1.0

    ours = wigner_d_matrices(len(Js) - 1, jnp.asarray(Q, dtype=jnp.float32))
    # Euler extraction (same formulas as both frameworks, numpy double)
    g2 = np.arctan2(np.sqrt(Q[:, 0, 2] ** 2 + Q[:, 1, 2] ** 2), Q[:, 2, 2])
    g1 = np.arctan2(Q[:, 2, 1], -Q[:, 2, 0])
    g3 = np.arctan2(Q[:, 1, 2], Q[:, 0, 2])
    worst = 0.0
    for l, J in enumerate(Js):
        S = _sign_S(l)
        D_ref = np.stack(
            [
                _ref_z_rot(a3, l) @ J @ _ref_z_rot(a2, l) @ J @ _ref_z_rot(a1, l)
                for a1, a2, a3 in zip(g1, g2, g3)
            ]
        )
        want = S[None] @ np.asarray(ours[l], dtype=np.float64) @ S[None]
        worst = max(worst, float(np.abs(D_ref - want).max()))
        # homomorphism check in the reference basis (double precision)
        if l > 0:
            hom = np.abs(D_ref[0] @ D_ref[1] - _d_ref_of(Q[0] @ Q[1], l, J)).max()
            worst = max(worst, float(hom))
    return worst


def _d_ref_of(R: np.ndarray, l: int, J: np.ndarray) -> np.ndarray:
    g2 = np.arctan2(np.sqrt(R[0, 2] ** 2 + R[1, 2] ** 2), R[2, 2])
    g1 = np.arctan2(R[2, 1], -R[2, 0])
    g3 = np.arctan2(R[1, 2], R[0, 2])
    return _ref_z_rot(g3, l) @ J @ _ref_z_rot(g2, l) @ J @ _ref_z_rot(g1, l)


def write_jdense(path: str, max_degree: int = 8) -> None:
    import torch

    Js = generate_jdense(max_degree)
    torch.save([torch.from_numpy(J) for J in Js], path)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "J_dense.pt"
    deg = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    Js = generate_jdense(deg)
    err = _verify_against_ours(Js)
    print(f"degrees 0..{deg}: reference-formula vs ours max|Δ| = {err:.2e}")
    write_jdense(out, deg)
    print(f"wrote {out}")
