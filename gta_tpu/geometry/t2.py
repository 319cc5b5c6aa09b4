"""T(2) planar-translation representations (homogeneous 3x3 matrices).

Reference semantics: gta.py:72-89 (make_T2mats). The inverse is analytic
([[I, -coord], [0, 1]]) — no linear solve needed, unlike the reference's
torch.linalg.inv (encoder.py:213).
"""

from __future__ import annotations

import jax.numpy as jnp


def make_t2_mats(coord: jnp.ndarray) -> jnp.ndarray:
    """[..., 2] coords -> [..., 3, 3] homogeneous translation matrices.

    [[1, 0, cx], [0, 1, cy], [0, 0, 1]].
    """
    shape = coord.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(2, dtype=coord.dtype), (*shape, 2, 2))
    top = jnp.concatenate([eye, coord[..., :, None]], -1)  # [..., 2, 3]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype=coord.dtype), (*shape, 1, 3)
    )
    return jnp.concatenate([top, bottom], -2)


def make_t2_mats_inv(coord: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of make_t2_mats: translation by -coord."""
    return make_t2_mats(-coord)


def apply_t2(mat: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 3, 3] to homogeneous triples x [..., C, 3].

    mat broadcasts over the C axis.
    """
    return jnp.einsum("...ij,...cj->...ci", mat, x)
