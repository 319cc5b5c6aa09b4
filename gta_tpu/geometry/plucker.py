"""Plücker ray parameterization and pairwise ray distance (GBT baseline).

Reference semantics: source/utils/gbt.py. The distance is rewritten
branch-free with jnp.where (the reference uses boolean masking,
gbt.py:93-94, which doesn't jit).
"""

from __future__ import annotations

import jax.numpy as jnp


def plucker_params(ray: jnp.ndarray) -> jnp.ndarray:
    """(origin, direction) [..., 6] -> Plücker (d, o x d) [..., 6]."""
    o = ray[..., :3]
    d = ray[..., 3:]
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    m = jnp.cross(o, d)
    return jnp.concatenate([d, m], -1)


def plucker_dist(ray1: jnp.ndarray, ray2: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Pairwise distance between Plücker rays: [B, Q, 6] x [B, P, 6] -> [B, Q, P].

    Skew lines: |l1.m2 + l2.m1| / ||l1 x l2||; parallel lines:
    ||l1 x (m1 - m2)|| / ||l1||^2 (reference gbt.py:61-96).
    """
    r1 = ray1[:, :, None]  # [B, Q, 1, 6]
    r2 = ray2[:, None, :]  # [B, 1, P, 6]
    l1, m1 = r1[..., :3], r1[..., 3:]
    l2, m2 = r2[..., :3], r2[..., 3:]

    reci = jnp.abs(jnp.sum(l1 * m2, -1) + jnp.sum(l2 * m1, -1))  # [B, Q, P]
    l1xl2 = jnp.cross(jnp.broadcast_to(l1, reci.shape + (3,)), jnp.broadcast_to(l2, reci.shape + (3,)))
    l1xl2_n = jnp.linalg.norm(l1xl2, axis=-1)

    l1x_dm = jnp.cross(jnp.broadcast_to(l1, reci.shape + (3,)), jnp.broadcast_to(m1 - m2, reci.shape + (3,)))
    par = jnp.linalg.norm(l1x_dm, axis=-1) / (jnp.sum(l1 * l1, -1) + eps)

    skew = reci / (l1xl2_n + eps)
    return jnp.where(l1xl2_n > eps, skew, par)


def plucker_posenc(ray: jnp.ndarray, n_freqs: int = 15, start_freq: int = -6,
                   parameterize: str | None = None) -> jnp.ndarray:
    """NeRF-style frequency encoding of rays (reference gbt.py:7-39).

    Output layout: all sines over freqs then all cosines, each block
    [..., 6 * n_freqs].
    """
    if parameterize == "plucker":
        ray = plucker_params(ray)
    freqs = (2.0 ** jnp.arange(start_freq, start_freq + n_freqs, dtype=ray.dtype)) * jnp.pi
    scaled = ray[..., None, :] * freqs[:, None]  # [..., F, 6]; freq-major flatten below
    return jnp.concatenate(
        [jnp.sin(scaled).reshape(*ray.shape[:-1], -1), jnp.cos(scaled).reshape(*ray.shape[:-1], -1)],
        -1,
    )
