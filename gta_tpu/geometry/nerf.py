"""Volumetric (NeRF-style) sampling and integration utilities.

Functional JAX equivalents of the reference's sampling stack
(nerf.py:247-427): stratified coarse samples, inverse-CDF fine sampling,
and alpha-composited integration. The SRT-family models are light-field
(one MLP eval per ray) and don't exercise these in any shipped config —
they're provided for parity of capability and future volumetric decoders.
All functions are jit/vmap-safe (sorted-search instead of boolean indexing).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def stratified_sample_points(
    key: Optional[jax.Array],
    camera_pos: jnp.ndarray,  # [..., 3]
    rays: jnp.ndarray,  # [..., 3]
    min_dist: float = 0.035,
    max_dist: float = 30.0,
    num_samples: int = 256,
    min_z: Optional[float] = None,
    deterministic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coarse uniform/stratified depths + 3D points along each ray.

    Returns (depths [..., S], points [..., S, 3]). min_z clips the far
    plane at the ray's intersection with the z = min_z plane
    (reference nerf.py:247-292).
    """
    far = jnp.full_like(rays[..., 0], max_dist)
    if min_z is not None:
        t_int = (min_z - camera_pos[..., 2]) / rays[..., 2]
        hit = (t_int >= 0.0) & (t_int <= far)
        far = jnp.where(hit, t_int, far)

    borders = jnp.linspace(0.0, 1.0, num_samples + 1)
    borders = borders * (far[..., None] - min_dist) + min_dist  # [..., S+1]
    if deterministic or key is None:
        depths = 0.5 * (borders[..., 1:] + borders[..., :-1])
    else:
        u = jax.random.uniform(key, borders[..., 1:].shape)
        depths = borders[..., :-1] + u * (borders[..., 1:] - borders[..., :-1])
    points = camera_pos[..., None, :] + rays[..., None, :] * depths[..., None]
    return depths, points


def sample_pdf(
    key: Optional[jax.Array],
    bins: jnp.ndarray,  # [..., S+1]
    weights: jnp.ndarray,  # [..., S]
    num_samples: int,
    deterministic: bool = False,
) -> jnp.ndarray:
    """Inverse-CDF sampling from a depth histogram (reference nerf.py:331-370)."""
    weights = weights + 1e-5
    cdf = jnp.cumsum(weights, -1)
    cdf = cdf / cdf[..., -1:]
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [..., S+1]

    shape = (*bins.shape[:-1], num_samples)
    if deterministic or key is None:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, num_samples), shape)
    else:
        u = jax.random.uniform(key, shape)

    # batched searchsorted(side='right'): count of cdf entries <= u
    inds = jnp.sum((cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), -1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, -1)
    cdf_a = jnp.take_along_axis(cdf, above, -1)
    bins_b = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), -1)
    bins_a = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), -1)
    denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def fine_sample_points(
    key: Optional[jax.Array],
    camera_pos: jnp.ndarray,
    rays: jnp.ndarray,
    depth_dist: jnp.ndarray,  # [..., S] sums to 1
    depths: jnp.ndarray,  # [..., S]
    min_dist: float = 0.035,
    num_samples: int = 256,
    deterministic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fine sampling around the coarse depth distribution
    (reference nerf.py:295-328): 75% of mass to the preceding segment,
    25% to the following."""
    borders = jnp.concatenate(
        [
            jnp.full_like(depths[..., :1], min_dist),
            depths,
            1.5 * depths[..., -1:] - 0.5 * depths[..., -2:-1],
        ],
        -1,
    )  # [..., S+2]
    hist = jnp.zeros_like(borders[..., 1:])
    hist = hist.at[..., :-1].add(depth_dist * 0.75)
    hist = hist.at[..., 1:].add(depth_dist * 0.25)
    sample_depths = sample_pdf(key, borders, hist, num_samples, deterministic)
    points = camera_pos[..., None, :] + rays[..., None, :] * sample_depths[..., None]
    return sample_depths, points


def integrate_ray(
    densities: jnp.ndarray,  # [..., S]
    values: jnp.ndarray,  # [..., S, 3]
    depths: jnp.ndarray,  # [..., S]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Alpha-composite samples along rays (reference draw_nerf, nerf.py:373-427).

    Returns (rgba [..., 4], expected_depth [...], segment_probs [..., S]).
    """
    seg = depths[..., 1:] - depths[..., :-1]
    seg = jnp.concatenate([seg, jnp.full_like(seg[..., -1:], 1e10)], -1)
    p_empty = jnp.exp(-densities * seg)
    alpha = 1.0 - p_empty
    ray_empty = jnp.cumprod(p_empty + 1e-10, -1)
    ray_empty_shift = jnp.concatenate(
        [jnp.ones_like(ray_empty[..., :1]), ray_empty[..., :-1]], -1
    )
    seg_probs = alpha * ray_empty_shift
    total_alpha = 1.0 - ray_empty[..., -1]
    rgb = jnp.sum(values * seg_probs[..., None], -2)
    expected_depth = jnp.sum(seg_probs * depths, -1)
    rgba = jnp.concatenate([rgb, total_alpha[..., None]], -1)
    return rgba, expected_depth, seg_probs
