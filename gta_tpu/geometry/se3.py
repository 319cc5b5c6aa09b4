"""SE(3) rigid-transform math.

Analytic inverses (rotation transpose) replace the reference's
torch.linalg.inv calls (encoder.py:219, decoder.py:294) — cheaper and
better conditioned on TPU. `scale_mask` reproduces the learnable
translation-coefficient masking of reference gta.py:40-44: multiplying both
rho = inv(E) and its "inverse" E elementwise by the mask keeps them exact
inverses of each other while shrinking the translation column by
trans_coeff.
"""

from __future__ import annotations

import jax.numpy as jnp


def se3_inverse(mat: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of [..., 4, 4] rigid transforms [R, t; 0, 1]."""
    rot = mat[..., :3, :3]
    t = mat[..., :3, 3:]
    rot_t = jnp.swapaxes(rot, -1, -2)
    top = jnp.concatenate([rot_t, -rot_t @ t], -1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=mat.dtype), (*mat.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], -2)


def scale_mask(trans_coeff, dtype=jnp.float32) -> jnp.ndarray:
    """[4, 4] mask: ones except the translation column, which is trans_coeff.

    trans_coeff may be a traced scalar (it is a learnable per-layer param).
    """
    tc = jnp.asarray(trans_coeff, dtype=dtype).reshape(())
    col = jnp.concatenate([jnp.full((3,), tc, dtype=dtype), jnp.ones((1,), dtype=dtype)])
    mask = jnp.ones((4, 4), dtype=dtype).at[:, 3].set(col)
    return mask


def homogenize(v: jnp.ndarray, trans_coeff: float = 1.0) -> jnp.ndarray:
    """Append a constant `trans_coeff` coordinate: [..., K] -> [..., K+1]."""
    ones = jnp.full((*v.shape[:-1], 1), trans_coeff, dtype=v.dtype)
    return jnp.concatenate([v, ones], -1)


def rigid_transform(mat: jnp.ndarray, points: jnp.ndarray, trans_coeff: float = 1.0) -> jnp.ndarray:
    """Apply [..., 4, 4] rigid transforms to [..., K, 3] points.

    trans_coeff=1 transforms points, 0 transforms directions (reference
    common.py:182-196).
    """
    p = homogenize(points, trans_coeff)
    out = jnp.einsum("...ij,...kj->...ki", mat, p)
    return out[..., :3]


def rotate_z_mat(angle: float, dtype=jnp.float32) -> jnp.ndarray:
    """4x4 rotation about the world z-axis by `angle` radians."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.asarray(
        [[c, -s, 0.0, 0.0], [s, c, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]],
        dtype=dtype,
    )
