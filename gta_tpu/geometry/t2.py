"""T(2) planar-translation representations (homogeneous 3x3 matrices).

Reference semantics: gta.py:72-89 (make_T2mats) — translation in the
BOTTOM ROW (see make_t2_mats). The inverse is analytic (translation by
-coord, i.e. [[I2, 0], [-coord, 1]]) — no linear solve needed, unlike the
reference's torch.linalg.inv (encoder.py:213).
"""

from __future__ import annotations

import jax.numpy as jnp


def make_t2_mats(coord: jnp.ndarray) -> jnp.ndarray:
    """[..., 2] coords -> [..., 3, 3] homogeneous translation matrices.

    [[1, 0, 0], [0, 1, 0], [cx, cy, 1]] — translation in the BOTTOM ROW,
    matching the reference's construction exactly (gta.py:72-89 builds
    cat([cat([I2, coord_row], -2), (0,0,1)^T], -1)): the third channel of
    each feature triple is the accumulator slot, the first two pass
    through. Verified by weight-transplant parity vs the reference
    (tests/test_reference_parity.py, gta_t2 config).
    """
    shape = coord.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(2, dtype=coord.dtype), (*shape, 2, 2))
    left = jnp.concatenate([eye, coord[..., None, :]], -2)  # [..., 3, 2]
    right = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype=coord.dtype)[:, None], (*shape, 3, 1)
    )
    return jnp.concatenate([left, right], -1)


def make_t2_mats_inv(coord: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of make_t2_mats: translation by -coord."""
    return make_t2_mats(-coord)


def apply_t2(mat: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 3, 3] to homogeneous triples x [..., C, 3].

    mat broadcasts over the C axis.
    """
    return jnp.einsum("...ij,...cj->...ci", mat, x)
