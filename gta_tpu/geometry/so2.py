"""SO(2) rotary representations over image coordinates.

The TPU-native design stores rotors as (cos, sin) tables and applies them
RoPE-style with fused elementwise math instead of materializing [..., 2, 2]
matrices and doing tiny matmuls (the reference materializes full matrices,
gta.py:47-69). `make_so2_mats` reproduces the matrix form for parity tests.

Frequency ladder (reference gta.py:57-63 — note: NOT the standard RoPE
ladder): freqs[j] = 2^(j+1) / 2^n for j = 0..n-1, ascending, and
theta[..., d, j] = max_freqs[d] * 2*pi * coord[..., d] * freqs[j].
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def _freq_ladder(nfreqs: int, shared_freqs: bool, dtype) -> jnp.ndarray:
    if shared_freqs:
        return jnp.ones((nfreqs,), dtype=dtype)
    return (2.0 ** jnp.arange(1.0, nfreqs + 1.0, dtype=dtype)) / (2.0**nfreqs)


def so2_angles(
    coord: jnp.ndarray,
    nfreqs: int,
    max_freqs: Sequence[float] = (1.0, 1.0),
    shared_freqs: bool = False,
) -> jnp.ndarray:
    """Rotor angles for each (coordinate dim, frequency) pair.

    Args:
        coord: [..., D] coordinates (D = 2 for image coords).
    Returns:
        theta: [..., nfreqs*D], FREQUENCY-major ordering (rotor c = f*D + d).
        This is the reference's exact channel interleave: make_SO2mats
        stacks per-dim matrices at axis -3 giving [..., F, D, 2, 2]
        (gta.py:66-68), and pre_compute_reps flattens (F, D) together
        (encoder.py:196 flatten(-4, -3)) — verified by weight-transplant
        parity against the reference (tests/test_reference_parity.py).
    """
    dim = coord.shape[-1]
    freqs = _freq_ladder(nfreqs, shared_freqs, coord.dtype)  # [F]
    mf = jnp.asarray(max_freqs, dtype=coord.dtype)[:dim]  # [D]
    theta = 2.0 * jnp.pi * (mf * coord)[..., None, :] * freqs[:, None]  # [..., F, D]
    return theta.reshape(*coord.shape[:-1], dim * nfreqs)


def so2_rotors(theta: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, sin) rotor tables from angles."""
    return jnp.cos(theta), jnp.sin(theta)


def apply_rotor(cos: jnp.ndarray, sin: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Left-multiply 2-vectors by rotation matrices R(theta).

    Args:
        cos, sin: [..., C] rotor tables (broadcastable against x[..., C, :]).
        x: [..., C, 2] pairs.
    Returns:
        [..., C, 2]: (c*x0 - s*x1, s*x0 + c*x1).
    """
    x0, x1 = x[..., 0], x[..., 1]
    return jnp.stack([cos * x0 - sin * x1, sin * x0 + cos * x1], -1)


def apply_rotor_inv(cos: jnp.ndarray, sin: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Left-multiply by R(theta)^T = R(-theta)."""
    x0, x1 = x[..., 0], x[..., 1]
    return jnp.stack([cos * x0 + sin * x1, -sin * x0 + cos * x1], -1)


def make_so2_mats(
    coord: jnp.ndarray,
    nfreqs: int,
    max_freqs: Sequence[float] = (1.0, 1.0),
    shared_freqs: bool = False,
) -> jnp.ndarray:
    """Full rotation matrices [..., D*nfreqs, 2, 2] (reference form gta.py:47-69).

    Kept for parity tests and the flattened-rep ("elementwise_mul") ablation;
    the hot path uses so2_rotors + apply_rotor.
    """
    theta = so2_angles(coord, nfreqs, max_freqs, shared_freqs)
    c, s = jnp.cos(theta), jnp.sin(theta)
    row0 = jnp.stack([c, -s], -1)
    row1 = jnp.stack([s, c], -1)
    return jnp.stack([row0, row1], -2)  # [..., C, 2, 2]
