"""Attention similarity/softmax kernels (pure functions).

Softmax always runs in float32 regardless of compute dtype — the TPU
analogue of the reference's autocast behavior (its loss is asserted fp32,
trainer.py:122; TPUs are natively bf16 for the matmuls).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _softmax_f32(sim: jnp.ndarray, dtype) -> jnp.ndarray:
    return jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(dtype)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    tau: jnp.ndarray | float = 1.0,
    bias: Optional[jnp.ndarray] = None,
    flash: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """softmax(q k^T * scale / tau + bias) v over [B, H, T, C] operands.

    Returns (out, attn). `tau` may be a learnable scalar (adjustable
    softmax, reference layers.py:135-143); `bias` hosts e.g. the GBT
    Plücker-distance term. With flash=True (TPU, no bias, static tau) the
    Pallas blockwise kernel is used and attn is None.
    """
    if flash and bias is None and isinstance(tau, (int, float)):
        from gta_tpu.ops.flash import flash_attention

        out = flash_attention(q, k, v, sm_scale=float(scale) / float(tau))
        return out, None
    sim = jnp.einsum("bhqc,bhkc->bhqk", q, k, preferred_element_type=jnp.float32)
    sim = sim * scale / tau
    if bias is not None:
        sim = sim + bias
    attn = _softmax_f32(sim, v.dtype)
    out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
    return out, attn


def euclid_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    tau: jnp.ndarray | float = 1.0,
    bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Negative-squared-distance similarity: -0.5||q-k||^2 (expanded form).

    sim = q k^T - 0.5 q.q - 0.5 k.k (reference layers.py:213-224).
    """
    sim = jnp.einsum("bhqc,bhkc->bhqk", q, k, preferred_element_type=jnp.float32)
    sim = (
        sim
        - 0.5 * jnp.sum(q.astype(jnp.float32) ** 2, -1)[..., :, None]
        - 0.5 * jnp.sum(k.astype(jnp.float32) ** 2, -1)[..., None, :]
    )
    sim = sim * scale / tau
    if bias is not None:
        sim = sim + bias
    attn = _softmax_f32(sim, v.dtype)
    out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
    return out, attn
