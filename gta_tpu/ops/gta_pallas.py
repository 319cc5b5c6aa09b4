"""Fused-kernel GTA attention: XLA rep transforms around the Pallas flash
core.

Round-1 history, kept for the record: the first fused design ran the whole
pipeline (rep-transform -> attention -> inverse rep) inside one kernel,
expressing per-token group reps as full-width coefficient planes. It was
numerically exact but *lost* to the XLA einsum path: expanding compact
reps (a 4x4 per view + cos/sin per token) into per-token full-channel
planes inflates HBM traffic ~84x, which costs more than the fused
arithmetic saves. The measured truth is that the rep application is cheap,
XLA-friendly work (small per-view matmuls + RoPE elementwise that fuse
into the projection epilogues) — what XLA cannot do is avoid
materializing the O(Tq x Tk) attention matrix, in the forward AND in the
backward (reference layers.py:202-211 materializes it too; at batch 32
the decoder's fp32 attention matrix is ~1.2 GB per layer per direction).

So the production design composes:

    gta_transform_qkv (XLA, ops/gta.py)     -- exact oracle semantics
    -> flash_core     (Pallas fwd + fused recompute bwd, ops/flash_core.py)
    -> gta_untransform_out (XLA)

Gradients for q/k/v, trans_coeff, and every rep input flow through XLA
autodiff of the transforms plus the custom flash-core VJP — no
re-running of the forward composition (the round-1 backward did, costing
~1.6x the XLA step).

Parity: tests/test_gta_pallas.py checks outputs and gradients against the
einsum oracle in interpret mode on CPU; scripts/check_flash_parity runs
the same check on the real TPU.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from gta_tpu.config import GTAArgs
from gta_tpu.ops.flash_core import MAX_TK, flash_core
from gta_tpu.ops.gta import gta_transform_qkv, gta_untransform_out
from gta_tpu.ops.reps import GeomReps


def fused_gta_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    reps: GeomReps,
    args: GTAArgs,
    trans_coeff: Optional[jnp.ndarray],
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """GTA attention over [B, H, T, C] operands (C == f_dims.total) with the
    attention core fused (no attention-map output).

    Unsupported variants (euclid_sim, elementwise_mul, adjustable tau) use
    ops/gta.gta_attention instead; keys longer than MAX_TK fall back to it
    as well (no current config comes close).
    """
    assert not args.euclid_sim and not args.elementwise_mul
    from gta_tpu.ops.gta_fused import fused_gta_attention_v2, v2_supported

    if v2_supported(reps, args, q.shape[2], k.shape[2]):
        # fully-fused path: rep transforms inside the kernel (gta_fused.py)
        return fused_gta_attention_v2(
            q, k, v, reps, args, trans_coeff, scale, interpret
        )
    qt, kt, vt = gta_transform_qkv(q, k, v, reps, args, trans_coeff)
    if k.shape[2] <= MAX_TK:
        out = flash_core(qt, kt, vt, float(scale), interpret)
    elif interpret:
        # CPU/interpret callers have no TPU flash kernel to fall back to —
        # use the XLA softmax composition (exact, just materializes the map)
        from gta_tpu.ops.attention import dot_product_attention

        out, _ = dot_product_attention(qt, kt, vt, scale=float(scale))
    else:
        from gta_tpu.ops.flash import flash_attention

        out = flash_attention(qt, kt, vt, sm_scale=float(scale))
    if args.v_transform:
        out = gta_untransform_out(out, reps, args, trans_coeff)
    return out
