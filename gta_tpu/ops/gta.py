"""Geometric transform attention (GTA) — pure-JAX reference-form op.

Semantics match reference gta.py:92-279 (multihead_geometric_transform_
attention): each head's channel dim is split into group-typed slices
(triv/se3/so3/so2/t2); Q is left-multiplied by the inverse-transpose rep
(plain forward rep for the orthogonal groups, where they coincide), K and V
by the forward rep; standard softmax attention runs on the transformed
triple; the inverse query rep is applied to the output.

TPU-native differences from the reference:
  * SO(2) is applied RoPE-style from (cos, sin) tables — fused elementwise
    VPU math, no [.., 2, 2] matmuls, no materialized rep tensors.
  * All slicing offsets are static (FDims is config), so XLA sees fixed
    shapes and fuses the rep application into the surrounding matmuls.
  * Softmax runs in float32 regardless of compute dtype.

This op is the correctness oracle for the fused Pallas kernel
(ops/gta_pallas.py) — the two are cross-checked by parity tests.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from gta_tpu.config import GTAArgs
from gta_tpu.geometry.se3 import scale_mask, homogenize
from gta_tpu.geometry.so2 import apply_rotor, apply_rotor_inv
from gta_tpu.ops.reps import GeomReps

AttnFn = Callable[..., Tuple[jnp.ndarray, jnp.ndarray]]


def _apply_mat_per_view(A: jnp.ndarray, x: jnp.ndarray, n_views: int, d: int) -> jnp.ndarray:
    """Left-multiply channel d-vectors by per-view (or per-view-token) matrices.

    A: [B, N, d, d] or [B, N, T', d, d]; x: [B, H, N*T', C] with C % d == 0.
    """
    B, H, T, C = x.shape
    xr = x.reshape(B, H, n_views, T // n_views, C // d, d)
    if A.ndim == 4:
        y = jnp.einsum("bnij,bhntcj->bhntci", A, xr)
    else:
        y = jnp.einsum("bntij,bhntcj->bhntci", A, xr)
    return y.reshape(B, H, T, C)


def _apply_mat_per_token(A: jnp.ndarray, x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Left-multiply channel d-vectors by per-token matrices A [B, T, d, d]."""
    B, H, T, C = x.shape
    xr = x.reshape(B, H, T, C // d, d)
    y = jnp.einsum("btij,bhtcj->bhtci", A, xr)
    return y.reshape(B, H, T, C)


def _apply_so3(Ds, x: jnp.ndarray, n_views: int, transpose: bool = False) -> jnp.ndarray:
    """Apply per-view block-diagonal Wigner-D stacks.

    Ds: tuple of [B, N, 2l+1, 2l+1] for degrees 1..n. x: [B, H, N*T', C]
    where C is a multiple of total_dim = sum(2l+1). The reshape merges
    token and channel axes per view (reference gta.py:182-186) — valid
    because the reps are per-view constants.
    """
    B, H, T, C = x.shape
    total = sum(D.shape[-1] for D in Ds)
    xr = x.reshape(B, H, n_views, (T // n_views) * (C // total), total)
    outs = []
    cur = 0
    for D in Ds:
        d = D.shape[-1]
        D = jax.lax.stop_gradient(D)  # reference detaches (gta.py:194-197)
        if transpose:
            D = jnp.swapaxes(D, -1, -2)
        outs.append(jnp.einsum("bnij,bhnkj->bhnki", D, xr[..., cur : cur + d]))
        cur += d
    return jnp.concatenate(outs, -1).reshape(B, H, T, C)


def _apply_so2(rotors, x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """RoPE-style rotor application. rotors: (cos, sin) each [B, T, R];
    x: [B, H, T, C] with C == 2R."""
    cos, sin = rotors
    B, H, T, C = x.shape
    xr = x.reshape(B, H, T, C // 2, 2)
    c = cos[:, None]  # [B, 1, T, R]
    s = sin[:, None]
    y = apply_rotor_inv(c, s, xr) if inverse else apply_rotor(c, s, xr)
    return y.reshape(B, H, T, C)


def _view_counts(reps: GeomReps) -> Tuple[Optional[int], Optional[int]]:
    """Static query/key view counts from rep table shapes (trace-time)."""
    nq = nk = None
    if reps.se3_q is not None:
        nq = reps.se3_q.shape[1]
    elif reps.so3_q is not None:
        nq = reps.so3_q[0].shape[1]
    if reps.se3_k is not None:
        nk = reps.se3_k.shape[1]
    elif reps.so3_k is not None:
        nk = reps.so3_k[0].shape[1]
    return nq, nk


def gta_transform_qkv(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    reps: GeomReps,
    args: GTAArgs,
    trans_coeff: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Apply group reps to (q, k, v) slices. Shapes [B, H, T, C]."""
    fd = args.f_dims
    v_transform = args.v_transform
    nq_views, nk_views = _view_counts(reps)
    qs, ks, vs = [], [], []

    for name, st, ed in fd.slices():
        q_s, k_s, v_s = q[..., st:ed], k[..., st:ed], v[..., st:ed]
        if name == "triv":
            pass
        elif name == "se3":
            msk = scale_mask(trans_coeff if trans_coeff is not None else 1.0, q.dtype)
            c_q = reps.se3_q * msk
            c_k = reps.se3_k * msk
            inv_c_q = reps.se3_q_inv * msk
            if args.euclid_sim:
                # Homogenize 3-vectors and push through the forward rep.
                def ap3(A, x, n):
                    B, H, T, C = x.shape
                    xr = homogenize(x.reshape(B, H, n, T // n, C // 3, 3))
                    if A.ndim == 4:
                        y = jnp.einsum("bnij,bhntcj->bhntci", A, xr)
                    else:
                        y = jnp.einsum("bntij,bhntcj->bhntci", A, xr)
                    return y[..., :3].reshape(B, H, T, C)

                q_s = ap3(c_q, q_s, nq_views)
                k_s = ap3(c_k, k_s, nk_views)
                v_s = ap3(c_k, v_s, nk_views) if v_transform else v_s
            else:
                q_s = _apply_mat_per_view(jnp.swapaxes(inv_c_q, -1, -2), q_s, nq_views, 4)
                k_s = _apply_mat_per_view(c_k, k_s, nk_views, 4)
                v_s = _apply_mat_per_view(c_k, v_s, nk_views, 4) if v_transform else v_s
        elif name == "so3":
            q_s = _apply_so3(reps.so3_q, q_s, nq_views)
            k_s = _apply_so3(reps.so3_k, k_s, nk_views)
            v_s = _apply_so3(reps.so3_k, v_s, nk_views) if v_transform else v_s
        elif name == "so2":
            q_s = _apply_so2(reps.so2_q, q_s)
            k_s = _apply_so2(reps.so2_k, k_s)
            v_s = _apply_so2(reps.so2_k, v_s) if v_transform else v_s
        elif name == "t2":
            q_s = _apply_mat_per_token(
                jnp.swapaxes(reps.t2_q_inv, -1, -2), q_s, 3
            )
            k_s = _apply_mat_per_token(reps.t2_k, k_s, 3)
            v_s = _apply_mat_per_token(reps.t2_k, v_s, 3) if v_transform else v_s
        qs.append(q_s)
        ks.append(k_s)
        vs.append(v_s)

    return jnp.concatenate(qs, -1), jnp.concatenate(ks, -1), jnp.concatenate(vs, -1)


def gta_untransform_out(
    out: jnp.ndarray,
    reps: GeomReps,
    args: GTAArgs,
    trans_coeff: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Apply the inverse query rep to the attention output (v_transform only)."""
    fd = args.f_dims
    nq_views, _ = _view_counts(reps)
    outs = []
    for name, st, ed in fd.slices():
        o = out[..., st:ed]
        if name == "triv":
            pass
        elif name == "se3":
            msk = scale_mask(trans_coeff if trans_coeff is not None else 1.0, out.dtype)
            inv_c_q = reps.se3_q_inv * msk
            if args.euclid_sim:
                B, H, T, C = o.shape
                xr = homogenize(o.reshape(B, H, nq_views, T // nq_views, C // 3, 3))
                if inv_c_q.ndim == 4:
                    y = jnp.einsum("bnij,bhntcj->bhntci", inv_c_q, xr)
                else:
                    y = jnp.einsum("bntij,bhntcj->bhntci", inv_c_q, xr)
                o = y[..., :3].reshape(B, H, T, C)
            else:
                o = _apply_mat_per_view(inv_c_q, o, nq_views, 4)
        elif name == "so3":
            o = _apply_so3(reps.so3_q, o, nq_views, transpose=True)
        elif name == "so2":
            o = _apply_so2(reps.so2_q, o, inverse=True)
        elif name == "t2":
            o = _apply_mat_per_token(reps.t2_q_inv, o, 3)
        outs.append(o)
    return jnp.concatenate(outs, -1)


def gta_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attn_fn: AttnFn,
    reps: GeomReps,
    args: GTAArgs,
    trans_coeff: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full GTA attention: transform -> attend -> untransform.

    q: [B, H, Tq, C], k/v: [B, H, Tk, C] with C == args.f_dims.total.
    View counts are inferred from the rep-table shapes at trace time.
    attn_fn(qt, kt, vt) -> (out, attn).
    """
    assert q.shape[-1] == args.f_dims.total, (
        f"head dim {q.shape[-1]} != f_dims total {args.f_dims.total}"
    )
    qt, kt, vt = gta_transform_qkv(q, k, v, reps, args, trans_coeff)
    out, attn = attn_fn(qt, kt, vt)
    if args.v_transform:
        out = gta_untransform_out(out, reps, args, trans_coeff)
    return out, attn


def vecrep_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attn_fn: AttnFn,
    vec_q: jnp.ndarray,
    vec_k: jnp.ndarray,
    vec_q_inv: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Elementwise-mul ablation (reference gta.py:282-298).

    vec_*: [B, T, C] learned projections of the flattened reps, broadcast
    over heads.
    """
    q = vec_q[:, None] * q
    k = vec_k[:, None] * k
    v = vec_k[:, None] * v
    out, attn = attn_fn(q, k, v)
    out = vec_q_inv[:, None] * out
    return out, attn
