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


# ---------------------------------------------------------------------------
# Full-width rep application (opt-in, measured SLOWER — kept as a documented
# negative result with parity tests).
#
# Motivation: profiling the flagship train step showed ~28% of device time
# in copy/slice/reshape/pad (scripts/profile_ops.py), much of it around the
# sliced path's slice -> einsum -> concatenate structure. The idea here was
# to apply the block-diagonal rep *full width* — SE(3) 4x4 on every vec4
# group, identity-padded SO(2) rotors — and stitch with a channel-mask
# select, so XLA fuses one elementwise pass with no slice/concat.
#
# Measured on the v5e (flagship CLEVR fp32 batch 32 train step, chained
# timing; sliced baseline 119.4 ms):
#   * broadcast-mul-reduce vec4 apply ([..,4,4] intermediate): 174.8 ms
#   * unrolled 4-term accumulation:                            221.6 ms
#   * batched einsum "btij,bhtgj->bhtgi" full width:           257.0 ms
# The jnp.where stitch forces both group transforms to compute and
# materialize over the full channel width (plus their VJPs), which costs
# far more than the slices it removes. The sliced path stays the default.
# ---------------------------------------------------------------------------


def _fullwidth_ok(args: GTAArgs) -> bool:
    fd = args.f_dims
    if args.euclid_sim:
        return False
    C = fd.total
    for name, st, ed in fd.slices():
        if name not in ("triv", "se3", "so2"):
            return False
        if name == "se3" and (st % 4 or C % 4):
            return False
        if name == "so2" and (st % 2 or C % 2):
            return False
    return True


def _per_token_mats(A: jnp.ndarray, T: int) -> jnp.ndarray:
    """Expand [B, N, 4, 4] (or view-token [B, N, T', 4, 4]) to [B, T, 4, 4]."""
    B = A.shape[0]
    if A.ndim == 5:
        return A.reshape(B, -1, 4, 4)
    return jnp.repeat(A, T // A.shape[1], axis=1)


def _fw_masks(fd) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Boolean channel masks [C] for the se3 and so2 spans (None if absent)."""
    import numpy as np

    C = fd.total
    se3 = np.zeros((C,), bool)
    so2 = np.zeros((C,), bool)
    for name, st, ed in fd.slices():
        if name == "se3":
            se3[st:ed] = True
        elif name == "so2":
            so2[st:ed] = True
    return (
        jnp.asarray(se3) if se3.any() else None,
        jnp.asarray(so2) if so2.any() else None,
    )


def _fw_rotors(rotors, fd, dtype):
    """Identity-pad (cos, sin) [B, T, R_so2] to full width [B, T, C//2]."""
    cos, sin = rotors
    B, T = cos.shape[0], cos.shape[1]
    cps, sps = [], []
    for name, st, ed in fd.slices():
        r = (ed - st) // 2
        if name == "so2":
            cps.append(cos.astype(dtype))
            sps.append(sin.astype(dtype))
        else:
            cps.append(jnp.ones((B, T, r), dtype))
            sps.append(jnp.zeros((B, T, r), dtype))
    return jnp.concatenate(cps, -1), jnp.concatenate(sps, -1)


def _fw_apply(
    x: jnp.ndarray,
    se3_M: Optional[jnp.ndarray],
    rotors,
    args: GTAArgs,
    inverse_rotor: bool = False,
) -> jnp.ndarray:
    """Apply the block-diagonal rep to all of x [B, H, T, C] in one fused pass.

    se3_M: per-token [B, T, 4, 4] (already masked/scaled), or None.
    rotors: full-width identity-padded (cos, sin) [B, T, C//2], or None.
    """
    fd = args.f_dims
    B, H, T, C = x.shape
    mask_se3, mask_so2 = _fw_masks(fd)
    out = x
    if rotors is not None:
        c, s = rotors
        xr = x.reshape(B, H, T, C // 2, 2)
        y = apply_rotor_inv(c[:, None], s[:, None], xr) if inverse_rotor else apply_rotor(
            c[:, None], s[:, None], xr
        )
        out = jnp.where(mask_so2, y.reshape(B, H, T, C), out)
    if se3_M is not None:
        xg = x.reshape(B, H, T, C // 4, 4)
        y4 = jnp.einsum("btij,bhtgj->bhtgi", se3_M, xg)
        out = jnp.where(mask_se3, y4.reshape(B, H, T, C), out)
    return out


def _fw_se3_sides(reps: GeomReps, args: GTAArgs, trans_coeff, Tq: int, Tk: int, dtype):
    """Per-token masked/scaled SE(3) mats for (q, k, out-inverse) sides."""
    if reps.se3_q is None:
        return None, None, None
    msk = scale_mask(trans_coeff if trans_coeff is not None else 1.0, dtype)
    q = _per_token_mats(jnp.swapaxes(reps.se3_q_inv * msk, -1, -2), Tq)
    k = _per_token_mats(reps.se3_k * msk, Tk)
    oq = _per_token_mats(reps.se3_q_inv * msk, Tq)
    return q, k, oq


# ---------------------------------------------------------------------------
# Block-diagonal rep application (the TPU default where it applies).
#
# All per-VIEW group factors (SE(3) vec4 blocks, SO(3) Wigner blocks,
# identity on triv and so2 spans) compose into ONE [C, C] block-diagonal
# matrix per view, so the whole per-view action is a single full-width
# einsum on the MXU; the per-TOKEN SO(2) rotors then ride one full-width
# RoPE pass with identity (cos=1, sin=0) padding outside the so2 span —
# identity rotors act as identity, so no mask/stitch is needed anywhere.
#
# Why: profiling showed the sliced slice -> narrow-einsum -> concat form
# spends ~28% of the train step in copy/slice/reshape/pad, and its [.., 32]
# intermediates waste 3/4 of each 128-lane tile. The block-diag form reads
# and writes each operand exactly once at full width. The extra matmul
# FLOPs (C^2 vs C*4 per token) are ~1% of the step on the MXU. The sliced
# path remains for the cases a per-view matrix cannot express: per-token
# SE(3) tables (MSN ray_to_se3 decoder queries), T(2) per-token 3x3s, and
# euclid_sim's non-linear homogenize.
# ---------------------------------------------------------------------------


def _blockdiag_ok(reps: GeomReps, args: GTAArgs) -> bool:
    if args.euclid_sim:
        return False
    for name, _, _ in args.f_dims.slices():
        if name == "t2":
            return False
    if reps.se3_q is not None and (reps.se3_q.ndim != 4 or reps.se3_k.ndim != 4):
        return False
    if any(name == "so2" for name, _, _ in args.f_dims.slices()):
        # full-width rotor pairing needs every span 2-aligned
        if any((ed - st) % 2 for _, st, ed in args.f_dims.slices()):
            return False
    return True


def _block_repeat(A: jnp.ndarray, g: int) -> jnp.ndarray:
    """[B, N, d, d] -> block-diag repeat [B, N, g*d, g*d]."""
    B, N, d, _ = A.shape
    M = jnp.zeros((B, N, g, g, d, d), A.dtype)
    M = M.at[:, :, jnp.arange(g), jnp.arange(g)].set(A[:, :, None])
    return M.transpose(0, 1, 2, 4, 3, 5).reshape(B, N, g * d, g * d)


def _blockdiag_mat(
    reps: GeomReps,
    args: GTAArgs,
    trans_coeff: Optional[jnp.ndarray],
    side: str,
    dtype,
) -> Optional[jnp.ndarray]:
    """Compose the per-view [B, N, C, C] block-diagonal rep for one side.

    side: 'q' (inverse-transpose), 'k' (forward), 'out' (inverse).
    Identity on triv and so2 spans (so2 is per-token, applied separately).
    Returns None when every span is identity (pure-so2/triv configs).
    """
    fd = args.f_dims
    C = fd.total
    parts = []
    nontrivial = False
    for name, st, ed in fd.slices():
        w = ed - st
        if name == "se3":
            msk = scale_mask(trans_coeff if trans_coeff is not None else 1.0, dtype)
            if side == "q":
                A = jnp.swapaxes(reps.se3_q_inv * msk, -1, -2)
            elif side == "k":
                A = reps.se3_k * msk
            else:
                A = reps.se3_q_inv * msk
            parts.append(_block_repeat(A.astype(dtype), w // 4))
            nontrivial = True
        elif name == "so3":
            Ds = reps.so3_q if side in ("q", "out") else reps.so3_k
            blocks = []
            for D in Ds:
                D = jax.lax.stop_gradient(D).astype(dtype)  # reference detaches
                if side in ("q", "out"):
                    # orthogonal: inverse-transpose == forward; 'out' wants
                    # the inverse == transpose (sliced path transpose=True)
                    D = D if side == "q" else jnp.swapaxes(D, -1, -2)
                blocks.append(D)
            total = sum(b.shape[-1] for b in blocks)
            B, N = blocks[0].shape[:2]
            stack = jnp.zeros((B, N, total, total), dtype)
            cur = 0
            for b in blocks:
                d = b.shape[-1]
                stack = stack.at[:, :, cur : cur + d, cur : cur + d].set(b)
                cur += d
            parts.append(_block_repeat(stack, w // total))
            nontrivial = True
        else:  # triv / so2: identity
            parts.append(None)
    if not nontrivial:
        return None
    shapes = [p for p in parts if p is not None]
    B, N = shapes[0].shape[:2]
    M = jnp.zeros((B, N, C, C), dtype)
    for (name, st, ed), p in zip(fd.slices(), parts):
        if p is None:
            idx = jnp.arange(st, ed)
            M = M.at[:, :, idx, idx].set(1.0)
        else:
            M = M.at[:, :, st:ed, st:ed].set(p)
    return M


def _apply_blockdiag(M: jnp.ndarray, x: jnp.ndarray, n_views: int) -> jnp.ndarray:
    B, H, T, C = x.shape
    xr = x.reshape(B, H, n_views, T // n_views, C)
    y = jnp.einsum("bnij,bhntj->bhnti", M, xr)
    return y.reshape(B, H, T, C)


def _apply_so2_fullwidth(rotors, fd, x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    cos, sin = _fw_rotors(rotors, fd, x.dtype)
    B, H, T, C = x.shape
    xr = x.reshape(B, H, T, C // 2, 2)
    y = (
        apply_rotor_inv(cos[:, None], sin[:, None], xr)
        if inverse
        else apply_rotor(cos[:, None], sin[:, None], xr)
    )
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
    impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Apply group reps to (q, k, v) slices. Shapes [B, H, T, C].

    impl: 'auto' uses the block-diagonal per-view matmul + full-width rotor
    form where it applies (see the block-diag note above) and falls back to
    'sliced' (slice/einsum/concat) otherwise; 'sliced' forces the fallback;
    'fullwidth' opts into the masked full-width form (a measured negative
    result, kept for the record — tests cross-check all three).
    """
    fd = args.f_dims
    v_transform = args.v_transform

    if impl in ("auto", "blockdiag") and _blockdiag_ok(reps, args):
        nq, nk = _view_counts(reps)
        Mq = _blockdiag_mat(reps, args, trans_coeff, "q", q.dtype)
        Mk = _blockdiag_mat(reps, args, trans_coeff, "k", k.dtype)
        qt = _apply_blockdiag(Mq, q, nq) if Mq is not None else q
        kt = _apply_blockdiag(Mk, k, nk) if Mk is not None else k
        vt = (_apply_blockdiag(Mk, v, nk) if Mk is not None else v) if v_transform else v
        if reps.so2_q is not None:
            qt = _apply_so2_fullwidth(reps.so2_q, fd, qt)
        if reps.so2_k is not None:
            kt = _apply_so2_fullwidth(reps.so2_k, fd, kt)
            if v_transform:
                vt = _apply_so2_fullwidth(reps.so2_k, fd, vt)
        return qt, kt, vt

    if impl == "fullwidth" and _fullwidth_ok(args):
        Tq, Tk = q.shape[2], k.shape[2]
        Mq, Mk, _ = _fw_se3_sides(reps, args, trans_coeff, Tq, Tk, q.dtype)
        rot_q = _fw_rotors(reps.so2_q, fd, q.dtype) if reps.so2_q is not None else None
        rot_k = _fw_rotors(reps.so2_k, fd, k.dtype) if reps.so2_k is not None else None
        qt = _fw_apply(q, Mq, rot_q, args)
        kt = _fw_apply(k, Mk, rot_k, args)
        vt = _fw_apply(v, Mk, rot_k, args) if v_transform else v
        return qt, kt, vt

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
    impl: str = "auto",
) -> jnp.ndarray:
    """Apply the inverse query rep to the attention output (v_transform only)."""
    fd = args.f_dims

    if impl in ("auto", "blockdiag") and _blockdiag_ok(reps, args):
        nq, _ = _view_counts(reps)
        Mo = _blockdiag_mat(reps, args, trans_coeff, "out", out.dtype)
        o = _apply_blockdiag(Mo, out, nq) if Mo is not None else out
        if reps.so2_q is not None:
            o = _apply_so2_fullwidth(reps.so2_q, fd, o, inverse=True)
        return o

    if impl == "fullwidth" and _fullwidth_ok(args):
        Tq = out.shape[2]
        _, _, Moq = _fw_se3_sides(reps, args, trans_coeff, Tq, Tq, out.dtype)
        rot_q = _fw_rotors(reps.so2_q, fd, out.dtype) if reps.so2_q is not None else None
        return _fw_apply(out, Moq, rot_q, args, inverse_rotor=True)

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
