"""Pixel-coordinate grids and sinusoidal positional encodings.

Numpy-side grid builders (static, computed once per config) plus JAX
positional-encoding functions. Semantics match the reference framework's
coordinate conventions (see /root/reference/source/utils/gta.py:9-28 and
source/utils/common.py:115-168) so trained-model parity holds, but all
runtime math is jit-compilable JAX.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def make_2dcoord(h: int, w: int) -> np.ndarray:
    """Row-major normalized pixel coords in [0, 1), shape [h, w, 2].

    coord[i, j] = (i/h, j/w). Mirrors reference gta.py:9-16.
    """
    x = np.arange(h, dtype=np.float32) / h
    y = np.arange(w, dtype=np.float32) / w
    xg, yg = np.meshgrid(x, y, indexing="ij")
    return np.stack([xg, yg], -1).astype(np.float32)


def make_2dimgcoord(h: int, w: int) -> np.ndarray:
    """Image-convention coords (x right-to-left, y bottom-to-top), [h, w, 2].

    Mirrors reference gta.py:19-28.
    """
    x = (np.arange(w, dtype=np.float32) / w)[::-1]
    y = (np.arange(h, dtype=np.float32) / h)[::-1]
    xg, yg = np.meshgrid(x, y, indexing="xy")
    return np.stack([xg, yg], -1).astype(np.float32)


def octave_posenc(coords: jnp.ndarray, num_octaves: int, start_octave: int = 0) -> jnp.ndarray:
    """Octave sin/cos encoding: [..., D] -> [..., 2*D*num_octaves].

    Output layout is (all sines, all cosines), each block grouped per input
    dim with octaves fastest-varying — matches reference layers.py:52-81.
    """
    shape = coords.shape[:-1]
    dim = coords.shape[-1]
    octaves = jnp.arange(start_octave, start_octave + num_octaves, dtype=jnp.float32)
    mult = (2.0**octaves) * jnp.pi  # [O]
    scaled = coords[..., None] * mult  # [..., D, O]
    sines = jnp.sin(scaled).reshape(*shape, dim * num_octaves)
    cosines = jnp.cos(scaled).reshape(*shape, dim * num_octaves)
    return jnp.concatenate([sines, cosines], -1)


def ray_posenc(pos: jnp.ndarray, rays: jnp.ndarray, pos_octaves: int = 15,
               pos_start_octave: int = 0, ray_octaves: int = 15,
               ray_start_octave: int = 0) -> jnp.ndarray:
    """Concatenated camera-position + ray-direction octave encoding.

    With the 15/15 default this produces 2*3*15*2 = 180 channels, matching
    reference layers.py:84-96 (RayPosEncoder).
    """
    return jnp.concatenate(
        [
            octave_posenc(pos, pos_octaves, pos_start_octave),
            octave_posenc(rays, ray_octaves, ray_start_octave),
        ],
        -1,
    )


def posenc_2d_grid(d_model: int, height: int, width: int) -> np.ndarray:
    """Fixed 2D transformer positional encoding, shape [d_model, h, w].

    Sin/cos ladder with base 10000, first half of channels encodes width,
    second half height. Mirrors reference common.py:115-140. Static —
    numpy, computed once.
    """
    if d_model % 4 != 0:
        raise ValueError(f"d_model must be divisible by 4, got {d_model}")
    pe = np.zeros((d_model, height, width), dtype=np.float32)
    half = d_model // 2
    div_term = np.exp(np.arange(0.0, half, 2) * -(np.log(10000.0) / half))  # [half/2]
    pos_w = np.arange(0.0, width)[:, None]  # [w, 1]
    pos_h = np.arange(0.0, height)[:, None]  # [h, 1]
    pe[0:half:2] = np.sin(pos_w * div_term).T[:, None, :].repeat(height, 1)
    pe[1:half:2] = np.cos(pos_w * div_term).T[:, None, :].repeat(height, 1)
    pe[half::2] = np.sin(pos_h * div_term).T[:, :, None].repeat(width, 2)
    pe[half + 1 :: 2] = np.cos(pos_h * div_term).T[:, :, None].repeat(width, 2)
    return pe


def posenc_2d_coord(d_model: int, coord: jnp.ndarray, scale=(1.0, 1.0)) -> jnp.ndarray:
    """Coord-conditioned 2D positional encoding: [..., 2] -> [..., d_model].

    coord assumed in [0, 1]; `scale` rescales to pixel units. Output layout:
    [sin/cos interleaved over width ladder, then height ladder], matching
    reference common.py:143-168.
    """
    if d_model % 4 != 0:
        raise ValueError(f"d_model must be divisible by 4, got {d_model}")
    scale = jnp.asarray(scale, dtype=coord.dtype)
    coord = coord * scale
    half = d_model // 2
    div_term = jnp.exp(jnp.arange(0.0, half, 2) * -(jnp.log(10000.0) / half))  # [half/2]
    h = coord[..., 0:1] * div_term  # [..., half/2]
    w = coord[..., 1:2] * div_term
    pe_w = jnp.stack([jnp.sin(w), jnp.cos(w)], -1).reshape(*coord.shape[:-1], -1)
    pe_h = jnp.stack([jnp.sin(h), jnp.cos(h)], -1).reshape(*coord.shape[:-1], -1)
    return jnp.concatenate([pe_w, pe_h], -1)
