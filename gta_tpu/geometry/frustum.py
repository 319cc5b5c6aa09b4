"""Frustum positional-embedding geometry (frustum_posemb baseline).

Reference semantics: source/utils/frustum_posemb.py — lift normalized pixel
coords to D quadratically-spaced depths along the camera frustum and map
into the reference frame.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalized_intrinsics(height: int = 240, width: int = 320,
                          focal_length: float = 35.0, sensor_width: float = 32.0) -> np.ndarray:
    """Normalized 3x3 K for CLEVR's camera (frustum_posemb.py:6-10)."""
    fx = focal_length / sensor_width
    fy = focal_length * (width / height) / sensor_width
    return np.array([[fx, 0.0, 0.5], [0.0, fy, 0.5], [0.0, 0.0, 1.0]], dtype=np.float32)


def frustum_pixel_points(
    coords: jnp.ndarray,
    cam_to_ref: jnp.ndarray,
    D: int,
    intrinsics: np.ndarray | None = None,
    dmin: float = 0.1,
    dmax: float = 10.0,
) -> jnp.ndarray:
    """[B, N, T, 2] pixel coords -> [B, N, T, D*4] homogeneous frustum points.

    Depth ladder d_i = dmin + (dmax-dmin)/(D(D+1)) * i(i+1), i = 1..D
    (quadratic spacing, frustum_posemb.py:27).
    """
    if intrinsics is None:
        intrinsics = normalized_intrinsics()
    inv_K = jnp.asarray(np.linalg.inv(intrinsics), dtype=coords.dtype)
    ones = jnp.ones((*coords.shape[:-1], 1), dtype=coords.dtype)
    hom = jnp.concatenate([coords, ones], -1)  # [B, N, T, 3]
    cam_coords = hom @ inv_K.T  # [B, N, T, 3]

    points = []
    for i in range(1, D + 1):
        d = dmin + ((dmax - dmin) / (D * (D + 1))) * i * (i + 1)
        p = cam_coords * d
        p = jnp.concatenate([p, ones], -1)  # [B, N, T, 4]
        points.append(p)
    p3d = jnp.stack(points, -2)  # [B, N, T, D, 4]
    p3d = jnp.einsum("bnij,bntdj->bntdi", cam_to_ref, p3d)
    return p3d.reshape(*p3d.shape[:-2], -1)
