"""Fused GTA attention — single Pallas TPU kernel.

Fuses the whole GTA pipeline of ops/gta.py into one kernel pass:

    q' = A_q q ;  k' = A_k k ;  v' = A_k v          (per-token group reps)
    o  = softmax(q' k'^T * scale) v'                 (online/blockwise)
    out = A_o o                                      (inverse query rep)

avoiding both the attention-matrix HBM round trip and the six extra HBM
passes the unfused path spends reading/writing transformed q/k/v/out.

Uniform representation: channels are permuted component-major (all units of
a component contiguous), making every group rep one of two lane-aligned
primitives applied inside the kernel:

  * "mat" blocks (SE(3) 4x4, SO(3) Wigner d x d, T(2) 3x3): the same d x d
    matrix for all units of a token — d^2 broadcast multiply-adds with a
    per-token table [B, T, d*d].
  * "rotor" blocks (SO(2)): a distinct angle per unit — RoPE-style
    elementwise math with per-token tables [B, T, 2R] (cos || sin).

The kernel never materializes rep matrices. The channel permutation runs
outside the kernel (cheap gather; foldable into projection weights).

Backward: jax.custom_vjp — forward runs the fused kernel; backward takes
the VJP of the equivalent XLA composition (transform -> flash bwd ->
untransform), matching standard flash training cost and giving trans_coeff
gradients through the tables for free.

Parity: tests/test_gta_pallas.py checks against the einsum oracle
(ops/gta.py) in interpret mode on CPU.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gta_tpu.config import GTAArgs, FDims
from gta_tpu.geometry.se3 import scale_mask
from gta_tpu.ops.reps import GeomReps

LANE = 128
NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class BlockDesc:
    """One group in the permuted channel layout."""

    kind: str  # 'mat' | 'rotor'
    d: int  # block size ('mat') or 2 ('rotor')
    w: int  # units per component (contiguous lane width)
    off: int  # channel offset of component 0


def build_layout(fd: FDims, so3_dims: Sequence[int] = ()) -> Tuple[np.ndarray, Tuple[BlockDesc, ...]]:
    """Component-major permutation (new channel -> old channel) + descriptors.

    so3_dims: per-degree block sizes, e.g. (3, 5) for degrees 1..2.
    """
    perm = []
    descs = []
    off = 0
    for name, st, ed in fd.slices():
        n = ed - st
        if name == "triv":
            perm.extend(range(st, ed))
        elif name == "se3":
            w = n // 4
            for j in range(4):
                perm.extend(st + u * 4 + j for u in range(w))
            descs.append(BlockDesc("mat", 4, w, off))
        elif name == "so3":
            total = sum(so3_dims)
            copies = n // total
            comp0 = 0
            doff = off
            for d in so3_dims:
                for j in range(d):
                    perm.extend(st + u * total + comp0 + j for u in range(copies))
                descs.append(BlockDesc("mat", d, copies, doff))
                doff += d * copies
                comp0 += d
        elif name == "so2":
            w = n // 2
            for j in range(2):
                perm.extend(st + u * 2 + j for u in range(w))
            descs.append(BlockDesc("rotor", 2, w, off))
        elif name == "t2":
            w = n // 3
            for j in range(3):
                perm.extend(st + u * 3 + j for u in range(w))
            descs.append(BlockDesc("mat", 3, w, off))
        off += n
    return np.asarray(perm, np.int32), tuple(descs)


def _apply_blocks(x, tabs, descs: Tuple[BlockDesc, ...]):
    """Apply per-token group transforms to x [b, C]. tabs[i]: [b, F_i].

    Builds the result by pure concatenation of segments (group regions are
    contiguous and ascending by construction) — dynamic_update_slice inside
    Pallas kernels aliases across chained applications, so it must not be
    used here.
    """
    segments = []
    cursor = 0
    for desc, tab in zip(descs, tabs):
        d, w, off = desc.d, desc.w, desc.off
        if off > cursor:  # untouched (triv / gap) channels
            segments.append(x[:, cursor:off])
        if desc.kind == "rotor":
            cos = tab[:, :w]
            sin = tab[:, w:]
            x0 = x[:, off : off + w]
            x1 = x[:, off + w : off + 2 * w]
            block = jnp.concatenate([cos * x0 - sin * x1, sin * x0 + cos * x1], axis=1)
        else:
            cols = []
            for i in range(d):
                acc = None
                for j in range(d):
                    term = tab[:, i * d + j][:, None] * x[:, off + j * w : off + (j + 1) * w]
                    acc = term if acc is None else acc + term
                cols.append(acc)
            block = jnp.concatenate(cols, axis=1)
        segments.append(block.astype(x.dtype))
        cursor = off + d * w
    if cursor < x.shape[1]:
        segments.append(x[:, cursor:])
    return jnp.concatenate(segments, axis=1) if len(segments) > 1 else segments[0]


def _make_kernel(descs, n_tabs, v_transform, scale, tk_actual, block_k):
    def kernel(*refs):
        q_ref, k_ref, v_ref = refs[0], refs[1], refs[2]
        qtab_refs = refs[3 : 3 + n_tabs]
        ktab_refs = refs[3 + n_tabs : 3 + 2 * n_tabs]
        otab_refs = refs[3 + 2 * n_tabs : 3 + 3 * n_tabs]
        o_ref = refs[3 + 3 * n_tabs]
        m_scr, l_scr, acc_scr = refs[4 + 3 * n_tabs :]

        ik = pl.program_id(3)
        nk = pl.num_programs(3)

        @pl.when(ik == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        qtabs = [r[0].astype(jnp.float32) for r in qtab_refs]
        ktabs = [r[0].astype(jnp.float32) for r in ktab_refs]

        q = q_ref[0, 0].astype(jnp.float32)  # [bq, C]
        qt = _apply_blocks(q, qtabs, descs)
        k = k_ref[0, 0].astype(jnp.float32)  # [bk, C]
        kt = _apply_blocks(k, ktabs, descs)
        v = v_ref[0, 0].astype(jnp.float32)
        vt = _apply_blocks(v, ktabs, descs) if v_transform else v

        s = (
            jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )  # [bq, bk]

        key_pos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_pos < tk_actual, s, NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = jnp.broadcast_to(l_scr[:, :1] * alpha + jnp.sum(p, -1, keepdims=True), l_scr.shape)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p, vt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

        @pl.when(ik == nk - 1)
        def _():
            o = acc_scr[:] / l_scr[:, :1]
            if v_transform:
                otabs = [r[0].astype(jnp.float32) for r in otab_refs]
                o = _apply_blocks(o, otabs, descs)
            o_ref[0, 0, :, :] = o.astype(o_ref.dtype)

    return kernel


def tables_to_planes(tabs, descs: Tuple[BlockDesc, ...], C: int):
    """Re-express per-token block-diag transforms as full-width coefficient
    planes: y[c] = sum_delta A_delta[c] * x[c + delta].

    The in-kernel application then uses only lane-aligned full-width
    multiply-adds (one rolled copy of x per distinct channel shift delta)
    instead of d^2 sub-lane-width slices per group — the VPU-efficiency fix
    for the table application. Returns (deltas, planes [B, T, n_deltas*C]).
    Identity is encoded on all channels outside desc regions (triv + pad).
    """
    B, T = tabs[0].shape[:2]
    dtype = tabs[0].dtype
    deltas = {0}
    for desc in descs:
        if desc.kind == "rotor":
            deltas |= {desc.w, -desc.w}
        else:
            deltas |= {(j - i) * desc.w for i in range(desc.d) for j in range(desc.d)}
    deltas = tuple(sorted(deltas))

    # Assemble each delta-plane as a single concatenation over disjoint
    # channel segments (sequential scatter updates cost ~0.5 ms of small
    # kernels per call at flagship shapes).
    desc_list = sorted(zip(descs, tabs), key=lambda p: p[0].off)

    def segment(desc, tab, delta):
        """[B, T, d*w] coefficients of this desc's region for a given delta."""
        d, w = desc.d, desc.w
        if desc.kind == "rotor":
            cos, sin = tab[..., :w], tab[..., w:]
            zero = jnp.zeros_like(cos)
            if delta == 0:
                return jnp.concatenate([cos, cos], -1)
            if delta == w:
                return jnp.concatenate([-sin, zero], -1)
            if delta == -w:
                return jnp.concatenate([zero, sin], -1)
            return None
        parts = []
        any_nonzero = False
        for i in range(d):
            j = i + delta // w if delta % w == 0 else None
            if j is not None and 0 <= j < d:
                coef = tab[..., i * d + j : i * d + j + 1]
                parts.append(jnp.broadcast_to(coef, (B, T, w)))
                any_nonzero = True
            else:
                parts.append(jnp.zeros((B, T, w), dtype))
        return jnp.concatenate(parts, -1) if any_nonzero else None

    per_delta = []
    for delta in deltas:
        segs = []
        cursor = 0
        for desc, tab in desc_list:
            if desc.off > cursor:  # triv/gap: identity on delta 0
                gap = desc.off - cursor
                fill = jnp.ones((B, T, gap), dtype) if delta == 0 else jnp.zeros((B, T, gap), dtype)
                segs.append(fill)
            s = segment(desc, tab, delta)
            dw = desc.d * desc.w
            segs.append(s if s is not None else jnp.zeros((B, T, dw), dtype))
            cursor = desc.off + dw
        if cursor < C:  # channel padding: identity on delta 0
            gap = C - cursor
            fill = jnp.ones((B, T, gap), dtype) if delta == 0 else jnp.zeros((B, T, gap), dtype)
            segs.append(fill)
        per_delta.append(jnp.concatenate(segs, -1))
    planes = jnp.concatenate(per_delta, -1)  # [B, T, n_deltas*C]
    return deltas, planes


def _apply_planes(x, plane_tab, deltas, C):
    """y = sum_delta A_delta * x[. + delta] with full-width lane ops.

    x: [b, C]; plane_tab: [b, n_deltas*C]. Static jnp.roll lowers to two
    full-width slices + concat — no sub-lane waste.
    """
    acc = None
    for n, delta in enumerate(deltas):
        xs = x if delta == 0 else jnp.roll(x, -delta, axis=1)
        term = plane_tab[:, n * C : (n + 1) * C] * xs
        acc = term if acc is None else acc + term
    return acc


def _make_kernel_singlepass(deltas, C, v_transform, scale, tk_actual,
                            mxu_bf16=True):
    """Whole-KV-in-VMEM variant: grid (B, H, nq), one softmax pass.

    GTA sequence lengths are short (<= ~1280 keys after padding), so the
    entire K/V block fits VMEM. K/V arrive PRE-TRANSFORMED (the k-side rep
    application is tiny and runs in XLA where it fuses into the projection
    epilogues). The kernel fuses the q-side transform, attention, and the
    inverse output rep — the work proportional to the large query axis —
    using full-width coefficient planes (see tables_to_planes).
    """

    def kernel(q_ref, kt_ref, vt_ref, qplane_ref, oplane_ref, o_ref):
        qt = _apply_planes(
            q_ref[0, 0].astype(jnp.float32), qplane_ref[0].astype(jnp.float32),
            deltas, C,
        )
        kt = kt_ref[0, 0].astype(jnp.float32)
        vt = vt_ref[0, 0].astype(jnp.float32)

        # bf16 MXU operands with f32 accumulation — the same effective
        # precision as XLA's default matmul policy on TPU (true-fp32 MXU
        # passes were the bulk of the kernel's slowdown)
        md = jnp.bfloat16 if mxu_bf16 else jnp.float32
        s = (
            jax.lax.dot_general(
                qt.astype(md), kt.astype(md), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # [bq, Tk_p]
        key_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_pos < tk_actual, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        o = jax.lax.dot_general(
            p.astype(md), vt.astype(md), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / jnp.sum(p, axis=-1, keepdims=True)
        if v_transform:
            o = _apply_planes(o, oplane_ref[0].astype(jnp.float32), deltas, C)
        o_ref[0, 0, :, :] = o.astype(o_ref.dtype)

    return kernel


def _apply_blocks_xla(x, tabs, descs: Tuple[BlockDesc, ...]):
    """XLA-side table application on [B, H, T, C] (permuted layout);
    tabs[i]: [B, T, F]. Mirrors _apply_blocks semantics."""
    segments = []
    cursor = 0
    for desc, tab in zip(descs, tabs):
        d, w, off = desc.d, desc.w, desc.off
        if off > cursor:
            segments.append(x[..., cursor:off])
        t = tab[:, None]  # [B, 1, T, F]
        if desc.kind == "rotor":
            cos, sin = t[..., :w], t[..., w:]
            x0 = x[..., off : off + w]
            x1 = x[..., off + w : off + 2 * w]
            block = jnp.concatenate([cos * x0 - sin * x1, sin * x0 + cos * x1], -1)
        else:
            cols = []
            for i in range(d):
                acc = None
                for j in range(d):
                    term = t[..., i * d + j : i * d + j + 1] * x[
                        ..., off + j * w : off + (j + 1) * w
                    ]
                    acc = term if acc is None else acc + term
                cols.append(acc)
            block = jnp.concatenate(cols, -1)
        segments.append(block.astype(x.dtype))
        cursor = off + d * w
    if cursor < x.shape[-1]:
        segments.append(x[..., cursor:])
    return jnp.concatenate(segments, -1) if len(segments) > 1 else segments[0]


# whole-KV single-pass kernel used when padded key length fits VMEM
_SINGLEPASS_MAX_TK = 2048


def _fused_call(q, k, v, qtabs, ktabs, otabs, descs, v_transform, scale,
                tk_actual, block_q, block_k, interpret=False):
    """q [B,H,Tq,C] / k,v [B,H,Tk,C] (all padded); tables [B, T, F]."""
    B, H, Tq, C = q.shape
    Tk = k.shape[2]
    n_tabs = len(qtabs)

    if Tk <= _SINGLEPASS_MAX_TK:
        # K/V rep application in XLA (small, fuses upstream); kernel fuses
        # the query-proportional work via full-width coefficient planes
        kt = _apply_blocks_xla(k, ktabs, descs)
        vt = _apply_blocks_xla(v, ktabs, descs) if v_transform else v
        deltas, qplanes = tables_to_planes(qtabs, descs, C)
        if v_transform:
            _, oplanes = tables_to_planes(otabs, descs, C)
        else:
            oplanes = qplanes  # unused by the kernel

        grid = (B, H, Tq // block_q)
        qspec = pl.BlockSpec((1, 1, block_q, C), lambda b, h, iq: (b, h, iq, 0))
        kspec = pl.BlockSpec((1, 1, Tk, C), lambda b, h, iq: (b, h, 0, 0))
        pspec = pl.BlockSpec(
            (1, block_q, qplanes.shape[-1]), lambda b, h, iq: (b, iq, 0)
        )
        out_spec = pl.BlockSpec((1, 1, block_q, C), lambda b, h, iq: (b, h, iq, 0))
        # interpret mode backs the CPU parity tests, which compare against
        # the fp32 oracle — keep full precision there
        kernel = _make_kernel_singlepass(
            deltas, C, v_transform, scale, tk_actual, mxu_bf16=not interpret
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[qspec, kspec, kspec, pspec, pspec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            interpret=interpret,
        )(q, kt, vt, qplanes, oplanes)

    grid = (B, H, Tq // block_q, Tk // block_k)

    qspec = pl.BlockSpec((1, 1, block_q, C), lambda b, h, iq, ik: (b, h, iq, 0))
    kspec = pl.BlockSpec((1, 1, block_k, C), lambda b, h, iq, ik: (b, h, ik, 0))

    def tabspec(t, block, qside):
        if qside:
            return pl.BlockSpec((1, block, t.shape[-1]), lambda b, h, iq, ik: (b, iq, 0))
        return pl.BlockSpec((1, block, t.shape[-1]), lambda b, h, iq, ik: (b, ik, 0))

    in_specs = (
        [qspec, kspec, kspec]
        + [tabspec(t, block_q, True) for t in qtabs]
        + [tabspec(t, block_k, False) for t in ktabs]
        + [tabspec(t, block_q, True) for t in otabs]
    )
    out_spec = pl.BlockSpec((1, 1, block_q, C), lambda b, h, iq, ik: (b, h, iq, 0))

    kernel = _make_kernel(descs, n_tabs, v_transform, scale, tk_actual, block_k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANE), jnp.float32),
            pltpu.VMEM((block_q, LANE), jnp.float32),
            pltpu.VMEM((block_q, C), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, *qtabs, *ktabs, *otabs)


# ---------------------------------------------------------------------------
# Table construction (XLA side)
# ---------------------------------------------------------------------------


def _expand_tokens(mat: jnp.ndarray, tokens: int) -> jnp.ndarray:
    """[B, N, d, d] or [B, N, T', d, d] -> per-token flat [B, tokens, d*d]."""
    B = mat.shape[0]
    if mat.ndim == 5:
        return mat.reshape(B, tokens, -1)
    rep = jnp.repeat(mat, tokens // mat.shape[1], axis=1)
    return rep.reshape(B, tokens, -1)


def build_tables(reps: GeomReps, args: GTAArgs, trans_coeff, tq: int, tk: int):
    """Per-token rep tables in build_layout descriptor order
    (se3, so3 degrees ascending, so2, t2) for (q, k, out) sides."""
    fd = args.f_dims
    qtabs, ktabs, otabs = [], [], []
    if fd.se3 > 0:
        msk = scale_mask(trans_coeff if trans_coeff is not None else 1.0, jnp.float32)
        c_k = reps.se3_k * msk
        inv_c_q = reps.se3_q_inv * msk
        qtabs.append(_expand_tokens(jnp.swapaxes(inv_c_q, -1, -2), tq))
        ktabs.append(_expand_tokens(c_k, tk))
        otabs.append(_expand_tokens(inv_c_q, tq))
    if fd.so3 > 0:
        for Dq, Dk in zip(reps.so3_q, reps.so3_k):
            Dq = jax.lax.stop_gradient(Dq)
            Dk = jax.lax.stop_gradient(Dk)
            qtabs.append(_expand_tokens(Dq, tq))
            ktabs.append(_expand_tokens(Dk, tk))
            otabs.append(_expand_tokens(jnp.swapaxes(Dq, -1, -2), tq))
    if fd.so2 > 0:
        cq, sq = reps.so2_q
        ck, sk = reps.so2_k
        qtabs.append(jnp.concatenate([cq, sq], -1))
        ktabs.append(jnp.concatenate([ck, sk], -1))
        otabs.append(jnp.concatenate([cq, -sq], -1))
    if fd.t2 > 0:
        t2q = jnp.swapaxes(reps.t2_q_inv, -1, -2)
        qtabs.append(t2q.reshape(*t2q.shape[:2], 9))
        ktabs.append(reps.t2_k.reshape(*reps.t2_k.shape[:2], 9))
        otabs.append(reps.t2_q_inv.reshape(*reps.t2_q_inv.shape[:2], 9))
    return qtabs, ktabs, otabs


def _pad_axis(x, axis, size):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pick_block(n, target):
    b = min(target, n)
    while n % b:
        b //= 2
    return max(b, LANE)


def _fused_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    reps: GeomReps,
    trans_coeff: Optional[jnp.ndarray],
    args: GTAArgs,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    fd = args.f_dims
    so3_dims = tuple(D.shape[-1] for D in reps.so3_q) if fd.so3 > 0 else ()
    perm, descs = build_layout(fd, so3_dims)
    inv_perm = np.argsort(perm)

    B, H, Tq, C = q.shape
    Tk = k.shape[2]
    qtabs, ktabs, otabs = build_tables(reps, args, trans_coeff, Tq, Tk)

    # permute channels component-major; pad channels to the lane width
    permj = jnp.asarray(perm)
    qp = _pad_axis(jnp.take(q, permj, axis=-1), -1, ((C + LANE - 1) // LANE) * LANE)
    kp = _pad_axis(jnp.take(k, permj, axis=-1), -1, qp.shape[-1])
    vp = _pad_axis(jnp.take(v, permj, axis=-1), -1, qp.shape[-1])

    block_q = _pick_block(((Tq + LANE - 1) // LANE) * LANE, LANE * 4)
    block_k = _pick_block(((Tk + LANE - 1) // LANE) * LANE, LANE)
    tq_p = ((Tq + block_q - 1) // block_q) * block_q
    tk_p = ((Tk + block_k - 1) // block_k) * block_k
    qp = _pad_axis(qp, 2, tq_p)
    kp = _pad_axis(kp, 2, tk_p)
    vp = _pad_axis(vp, 2, tk_p)
    qtabs = [_pad_axis(t, 1, tq_p) for t in qtabs]
    otabs = [_pad_axis(t, 1, tq_p) for t in otabs]
    ktabs = [_pad_axis(t, 1, tk_p) for t in ktabs]

    out = _fused_call(
        qp, kp, vp, qtabs, ktabs, otabs, descs, args.v_transform, scale,
        tk_actual=Tk, block_q=block_q, block_k=block_k, interpret=interpret,
    )
    out = out[:, :, :Tq, :C]
    return jnp.take(out, jnp.asarray(inv_perm), axis=-1)


def _xla_composition(q, k, v, reps, trans_coeff, args: GTAArgs, scale: float,
                     use_flash: bool):
    """Reference composition for the backward pass: XLA transform ->
    (flash) attention -> untransform. Matches the fused kernel bit-for-bit
    up to matmul precision."""
    import functools as ft

    from gta_tpu.ops.attention import dot_product_attention
    from gta_tpu.ops.gta import gta_attention

    attn_fn = ft.partial(dot_product_attention, scale=scale, flash=use_flash)
    out, _ = gta_attention(q, k, v, attn_fn, reps, args, trans_coeff)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_op(q, k, v, reps, trans_coeff, args, scale, interpret):
    return _fused_forward(q, k, v, reps, trans_coeff, args, scale, interpret)


def _fused_op_fwd(q, k, v, reps, trans_coeff, args, scale, interpret):
    out = _fused_forward(q, k, v, reps, trans_coeff, args, scale, interpret)
    return out, (q, k, v, reps, trans_coeff)


def _fused_op_bwd(args, scale, interpret, res, g):
    q, k, v, reps, trans_coeff = res
    # Plain XLA attention in the backward composition: measured faster than
    # the stock-flash VJP at GTA sequence lengths (interleaved train-step
    # bench: flash-based bwd doubled the step).
    fn = functools.partial(
        _xla_composition, args=args, scale=scale, use_flash=False
    )
    _, vjp = jax.vjp(fn, q, k, v, reps, trans_coeff)
    return vjp(g)


_fused_op.defvjp(_fused_op_fwd, _fused_op_bwd)


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
    """Fused GTA attention over [B, H, T, C] operands (C == f_dims.total).

    Differentiable (custom VJP; backward = flash-attention VJP of the
    equivalent XLA composition). No attention-map output. Unsupported
    variants (euclid_sim, elementwise_mul, adjustable tau) use
    ops/gta.gta_attention instead.
    """
    assert not args.euclid_sim and not args.elementwise_mul
    if trans_coeff is None:
        trans_coeff = jnp.ones((), jnp.float32)
    return _fused_op(q, k, v, reps, trans_coeff, args, float(scale), interpret)
