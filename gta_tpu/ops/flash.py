"""Blockwise (flash) attention on TPU via Pallas.

Sequences whose whole key block fits VMEM (every current config) route to
our lean single-pass kernel (ops/flash_core.py). Longer keys fall back to
the stock JAX Pallas TPU flash-attention kernel wrapped with the
padding/masking glue our shapes need: query/key lengths are padded to
128-multiples with segment-id masking so padded keys never receive
probability mass, and padded queries are sliced off. Either way this
removes the O(Tq x Tk) attention-matrix HBM round-trip that the XLA path
(and the reference, layers.py:202-211) materializes.

Constraints: no attention-map output, static sm_scale (the adjustable-tau
softmax and GBT bias variants stay on the XLA path — see
ops/attention.dot_product_attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gta_tpu.ops.flash_core import MAX_TK, flash_core

_BLOCK = 128


def _pad_len(n: int, block: int = _BLOCK) -> int:
    return ((n + block - 1) // block) * block


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, sm_scale: float = 1.0):
    """softmax(q k^T * sm_scale) v over [B, H, T, C] without materializing
    the attention matrix. Returns out [B, H, Tq, C]."""
    if k.shape[2] <= MAX_TK:
        return flash_core(q, k, v, float(sm_scale))

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention as _fa,
    )

    B, H, Tq, C = q.shape
    Tk = k.shape[2]
    tq_p, tk_p = _pad_len(Tq), _pad_len(Tk)
    # Zero-pad head dim to the 128-lane width: QK^T and the used output
    # columns are unchanged, and the MXU lanes are 128-wide regardless.
    c_p = _pad_len(C)

    def pad_t(x, t_p):
        t, c = x.shape[2], x.shape[3]
        if t == t_p and c == c_p:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_p - t), (0, c_p - c)))

    qp, kp, vp = pad_t(q, tq_p), pad_t(k, tk_p), pad_t(v, tk_p)

    seg = None
    if tk_p != Tk or tq_p != Tq:
        q_ids = (jnp.arange(tq_p) < Tq).astype(jnp.int32)[None].repeat(B, 0)
        kv_ids = (jnp.arange(tk_p) < Tk).astype(jnp.int32)[None].repeat(B, 0)
        seg = SegmentIds(q=q_ids, kv=kv_ids)

    def pick(n, target):
        # largest power-of-two multiple of 128 that divides n, capped at target
        b = min(target, n)
        while n % b:
            b //= 2
        return max(b, _BLOCK)

    bq = pick(tq_p, _BLOCK * 4)
    bk = pick(tk_p, _BLOCK)
    block_sizes = BlockSizes(
        block_q=bq,
        block_k_major=bk,
        block_k=bk,
        block_b=1,
        block_q_major_dkv=bq,
        block_k_major_dkv=bk,
        block_k_dkv=bk,
        block_q_dkv=bq,
        block_k_major_dq=bk,
        block_k_dq=bk,
        block_q_dq=bq,
    )
    out = _fa(qp, kp, vp, segment_ids=seg, sm_scale=sm_scale, block_sizes=block_sizes)
    return out[:, :, :Tq, :C]
