"""Fully-fused GTA attention: rep transforms inside the flash kernel.

The previous fused path (ops/gta_pallas.py) ran the group-rep transforms in
XLA around the flash core. Profiling the flagship train step showed XLA
spends ~25% of device time in layout copies/reshapes stitched around those
transforms: the [B,H,T,C] row-major layout the Pallas core demands never
matches what XLA's layout assignment picks for the per-view einsums, so
every attention call pays 4-6 full-tensor transposes (scripts/profile_ops).

This kernel removes the boundary entirely:

  * Operands arrive TOKEN-MAJOR [B, T, H*C] — bitcast-identical to the QKV
    projection output, so nothing runs between the projection matmul and
    the kernel (the caller's head split/merge transposes cancel against
    the ones here and XLA folds them away). Heads are static lane slices
    inside the kernel; Mosaic's (8, 128) block-shape rule is satisfied
    because blocks span the full H*C width (e.g. 384 = 3 lane tiles).
  * The per-VIEW group action (SE(3) vec4 blocks, SO(3) Wigner blocks —
    composed into one [C, C] matrix per view by ops/gta._blockdiag_mat) is
    applied in VMEM as a row-vector matmul `x @ M` right after the block
    load. Query views whose token count is 8-row aligned get one view per
    grid block; misaligned views (CLEVR encoder: 300 tokens/view) ride a
    whole-tensor block with static per-view row slices, exactly like the
    key/value side always does.
  * The per-TOKEN SO(2) rotors ride full-width identity-padded (cos, sin)
    tables (reference gta.py:47-69 semantics via ops/gta._fw_rotors): the
    pair mix (x0,x1) -> (-x1, x0) is two exact fp32 lane rolls + a parity
    select, no 2x2 matmuls, no channel slicing.
  * The output inverse rep (v_transform) applies in VMEM before the store.

Backward is a single recompute kernel (same structure as ops/flash_core):
it re-derives the transformed triple and softmax from the raw residuals,
then chains cotangents back through the output/query/key transforms. It
emits dq/dk/dv in token-major layout plus per-view [C, C] matrix
cotangents (heads are summed in-kernel); XLA autodiffs the tiny matrix
*construction* (so `trans_coeff`'s gradient flows through scale_mask
exactly as in the XLA path). Rotor tables get zero cotangents — they are
pure functions of data coordinates, never differentiated in training (the
reference likewise never differentiates coords).

Matmuls run with bf16 operands and fp32 accumulation (XLA's default TPU
policy for f32 dots — the XLA einsum path rounds identically); softmax and
all elementwise rotor math are fp32. Interpret mode keeps full fp32.

Reference semantics: gta.py:92-279; parity is tested against the einsum
oracle (ops/gta.gta_attention) in values and gradients
(tests/test_gta_fused.py).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gta_tpu.config import GTAArgs
from gta_tpu.ops.gta import (
    _blockdiag_mat,
    _blockdiag_ok,
    _fw_rotors,
    _view_counts,
)
from gta_tpu.ops.reps import GeomReps

MAX_TK = 2048  # whole-KV-in-VMEM limit (same as ops/flash_core)
MAX_BQ = 1024  # largest single-block query span
SPLIT_BQ = 512  # sub-block size for larger aligned views (must divide)
# experiment knob: prefer one whole-tensor q block (all views) up to this
# token count — K/V are loaded+transformed once per batch element instead
# of once per q block (see _q_blocking)
_WHOLE_BQ = int(os.environ.get("GTA_FUSED_WHOLE_BQ", "0"))

# trace-time FLOP accounting for benchmarks: XLA's cost analysis treats
# Pallas custom-calls as opaque (0 FLOPs), so bench.py enables TRACE_FLOPS
# around its train-step trace and adds these analytic counts to the
# XLA-visible total (see bench.py mfu).
TRACE_FLOPS = False
FLOP_TRACE: list = []


def _kernel_flops(st: "_Static", B: int, Tq: int, Tk: int, C: int):
    """(fwd, bwd) MXU FLOPs of one fused-kernel call, from the matmul
    structure of _fwd_kernel/_bwd_kernel (2 FLOPs per MAC)."""
    core = 2.0 * Tq * Tk * C
    tq_cc = 2.0 * Tq * C * C
    tk_cc = 2.0 * Tk * C * C
    fwd = 2 * core  # s = qt@kt^T, o = p@vt
    bwd = 5 * core  # s recompute, dp, dqt, dkt, dvt (o_att read from store_z)
    if st.has_mq:
        fwd += tq_cc
        bwd += 2 * tq_cc  # dq chain + dmq
    if st.has_mk:
        n_sides = 2 if st.v_transform else 1
        fwd += n_sides * tk_cc
        bwd += 2 * n_sides * tk_cc  # dk/dv chains + dmk accumulations
    if st.has_mo:
        fwd += tq_cc
        bwd += 2 * tq_cc  # do chain + dmo
    scale = float(B) * st.heads
    return fwd * scale, bwd * scale


@dataclasses.dataclass(frozen=True)
class _Static:
    """Hashable static config for the custom-vjp core."""

    scale: float
    heads: int
    nq: int  # total query views
    nqb: int  # query views per kernel block
    nk: int  # key views (always all in one block)
    bq: int  # query tokens per kernel block
    v_transform: bool
    has_mq: bool
    has_mk: bool
    has_mo: bool
    has_rotq: bool
    has_rotk: bool
    interpret: bool
    # Stash the pre-untransform attention output z = softmax(s) @ vt as a
    # second forward output. The backward needs it only for dmo (the
    # trans_coeff chain); recomputing it there costs a full core-scale
    # [bq,Tk]x[Tk,C] matmul per head while storing it is O(T*D) HBM traffic
    # (~0.3 ms vs ~8 ms at MSN-so3 decoder shapes, profiled r5).
    store_z: bool = False


def _dot(a, b, dims, mxu_dtype):
    return jax.lax.dot_general(
        a.astype(mxu_dtype),
        b.astype(mxu_dtype),
        (dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pair_swap_neg(z):
    """(x0, x1) pairs -> (-x1, x0), exact fp32 lane rolls (no matmul)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, z.ndim - 1)
    even = lane % 2 == 0
    zp = jnp.roll(z, -1, axis=-1)  # z[c+1]
    zm = jnp.roll(z, 1, axis=-1)  # z[c-1]
    return jnp.where(even, -zp, zm)


def _rot_fwd(c, s, z):
    return c * z + s * _pair_swap_neg(z)


def _rot_inv(c, s, z):
    return c * z - s * _pair_swap_neg(z)


def _per_view(x, mats, n_views, mxu):
    """Apply x[rows_of_view_i] @ mats[i] over equal static row slices."""
    tn = x.shape[0] // n_views
    if n_views == 1:
        return _dot(x, mats[0], ((1,), (0,)), mxu)
    return jnp.concatenate(
        [
            _dot(x[vi * tn : (vi + 1) * tn], mats[vi], ((1,), (0,)), mxu)
            for vi in range(n_views)
        ],
        axis=0,
    )


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _transform_sides(refs, h, st: _Static, mxu):
    """Per-head transformed (q0, qt, k0, v0, kt, vt) for head h."""
    (q_ref, k_ref, v_ref, mq_ref, mk_ref, _, cq_ref, sq_ref, ck_ref, sk_ref) = refs
    C = q_ref.shape[-1] // st.heads
    cols = slice(h * C, (h + 1) * C)
    q0 = q_ref[0, :, cols]
    k0 = k_ref[0, :, cols]
    v0 = v_ref[0, :, cols]

    if st.has_mq:
        qt = _per_view(q0, [mq_ref[0, vi] for vi in range(st.nqb)], st.nqb, mxu)
    else:
        qt = q0
    if st.has_rotq:
        qt = _rot_fwd(cq_ref[0], sq_ref[0], qt)

    if st.has_mk:
        mks = [mk_ref[0, vi] for vi in range(st.nk)]
        kt = _per_view(k0, mks, st.nk, mxu)
        vt = _per_view(v0, mks, st.nk, mxu) if st.v_transform else v0
    else:
        kt, vt = k0, v0
    if st.has_rotk:
        ck, sk = ck_ref[0], sk_ref[0]
        kt = _rot_fwd(ck, sk, kt)
        if st.v_transform:
            vt = _rot_fwd(ck, sk, vt)
    return q0, qt, k0, v0, kt, vt


def _fwd_kernel(*refs, st: _Static):
    if st.store_z:
        (q_ref, k_ref, v_ref, mq_ref, mk_ref, mo_ref,
         cq_ref, sq_ref, ck_ref, sk_ref, o_ref, z_ref) = refs
    else:
        (q_ref, k_ref, v_ref, mq_ref, mk_ref, mo_ref,
         cq_ref, sq_ref, ck_ref, sk_ref, o_ref) = refs
        z_ref = None
    mxu = jnp.float32 if st.interpret else jnp.bfloat16
    C = q_ref.shape[-1] // st.heads
    for h in range(st.heads):
        _, qt, _, _, kt, vt = _transform_sides(refs[:10], h, st, mxu)
        s = _dot(qt, kt, ((1,), (1,)), mxu) * st.scale  # [bq, Tk]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        o = _dot(p, vt, ((1,), (0,)), mxu) / jnp.sum(p, axis=-1, keepdims=True)
        if st.store_z:
            z_ref[0, :, h * C : (h + 1) * C] = o.astype(z_ref.dtype)
        if st.v_transform:
            if st.has_mo:
                o = _per_view(o, [mo_ref[0, vi] for vi in range(st.nqb)], st.nqb, mxu)
            if st.has_rotq:
                o = _rot_inv(cq_ref[0], sq_ref[0], o)
        o_ref[0, :, h * C : (h + 1) * C] = o.astype(o_ref.dtype)


def _bwd_kernel(*refs, st: _Static):
    (q_ref, k_ref, v_ref, mq_ref, mk_ref, mo_ref,
     cq_ref, sq_ref, ck_ref, sk_ref, g_ref, z_ref,
     dq_ref, dk_ref, dv_ref, dmq_ref, dmk_ref, dmo_ref) = refs
    mxu = jnp.float32 if st.interpret else jnp.bfloat16
    n = pl.program_id(1)
    iq = pl.program_id(2)
    C = q_ref.shape[-1] // st.heads

    @pl.when((n == 0) & (iq == 0))
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])
        if st.has_mk:
            dmk_ref[0] = jnp.zeros_like(dmk_ref[0])

    @pl.when(iq == 0)
    def _():
        if st.has_mq:
            dmq_ref[0] = jnp.zeros_like(dmq_ref[0])
        if st.has_mo:
            dmo_ref[0] = jnp.zeros_like(dmo_ref[0])

    tnq = q_ref.shape[1] // st.nqb
    tnk = k_ref.shape[1] // st.nk
    for h in range(st.heads):
        cols = slice(h * C, (h + 1) * C)
        q0, qt, k0, v0, kt, vt = _transform_sides(refs[:10], h, st, mxu)
        s = _dot(qt, kt, ((1,), (1,)), mxu) * st.scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # [bq, Tk]
        g = g_ref[0, :, cols].astype(jnp.float32)

        # output-side chain: out = rot_inv(o @ Mo)
        if st.v_transform:
            dz = _rot_fwd(cq_ref[0], sq_ref[0], g) if st.has_rotq else g
            if st.has_mo:
                # z (= softmax @ vt) was stashed by the forward (store_z);
                # reading it replaces a core-scale recompute matmul.
                o_att = z_ref[0, :, cols]
                do = jnp.concatenate(
                    [
                        _dot(dz[vi * tnq : (vi + 1) * tnq], mo_ref[0, vi], ((1,), (1,)), mxu)
                        for vi in range(st.nqb)
                    ],
                    axis=0,
                )
                for vi in range(st.nqb):
                    rows = slice(vi * tnq, (vi + 1) * tnq)
                    dmo_ref[0, vi] += _dot(o_att[rows], dz[rows], ((0,), (0,)), mxu)
            else:
                do = dz
        else:
            do = g

        # attention core VJP
        dp = _dot(do, vt, ((1,), (1,)), mxu)  # [bq, Tk]
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - delta) * st.scale
        dqt = _dot(ds, kt, ((1,), (0,)), mxu)  # [bq, C]
        dkt = _dot(ds, qt, ((0,), (0,)), mxu)  # [Tk, C]
        dvt = _dot(p, do, ((0,), (0,)), mxu)  # [Tk, C]

        # query-side chain: qt = rot(q @ Mq)
        dzq = _rot_inv(cq_ref[0], sq_ref[0], dqt) if st.has_rotq else dqt
        if st.has_mq:
            dq = jnp.concatenate(
                [
                    _dot(dzq[vi * tnq : (vi + 1) * tnq], mq_ref[0, vi], ((1,), (1,)), mxu)
                    for vi in range(st.nqb)
                ],
                axis=0,
            )
            dq_ref[0, :, cols] = dq.astype(dq_ref.dtype)
            for vi in range(st.nqb):
                rows = slice(vi * tnq, (vi + 1) * tnq)
                dmq_ref[0, vi] += _dot(q0[rows], dzq[rows], ((0,), (0,)), mxu)
        else:
            dq_ref[0, :, cols] = dzq.astype(dq_ref.dtype)

        # key/value-side chain: kt = rot_k(k @ Mk), vt = rot_k(v @ Mk)
        if st.has_rotk:
            ck, sk = ck_ref[0], sk_ref[0]
            dzk = _rot_inv(ck, sk, dkt)
            dzv = _rot_inv(ck, sk, dvt) if st.v_transform else dvt
        else:
            dzk, dzv = dkt, dvt
        if st.has_mk:
            for vi in range(st.nk):
                rows = slice(vi * tnk, (vi + 1) * tnk)
                mk_vi = mk_ref[0, vi]
                dk_ref[0, rows, cols] += _dot(
                    dzk[rows], mk_vi, ((1,), (1,)), mxu
                ).astype(dk_ref.dtype)
                dmk_ref[0, vi] += _dot(k0[rows], dzk[rows], ((0,), (0,)), mxu)
                if st.v_transform:
                    dv_ref[0, rows, cols] += _dot(
                        dzv[rows], mk_vi, ((1,), (1,)), mxu
                    ).astype(dv_ref.dtype)
                    dmk_ref[0, vi] += _dot(v0[rows], dzv[rows], ((0,), (0,)), mxu)
                else:
                    dv_ref[0, rows, cols] += dzv[rows].astype(dv_ref.dtype)
        else:
            dk_ref[0, :, cols] += dzk.astype(dk_ref.dtype)
            dv_ref[0, :, cols] += dzv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _specs(st: _Static, B, Tq, Tk, D, C):
    n_qblocks = st.nq // st.nqb
    nqs = Tq // n_qblocks // st.bq
    grid = (B, n_qblocks, nqs)
    qs = pl.BlockSpec((1, st.bq, D), lambda b, n, iq: (b, n * nqs + iq, 0))
    ks = pl.BlockSpec((1, Tk, D), lambda b, n, iq: (b, 0, 0))
    zero4 = lambda b, n, iq: (0, 0, 0, 0)
    zero3 = lambda b, n, iq: (0, 0, 0)
    mqs = pl.BlockSpec(
        (1, st.nqb, C, C) if st.has_mq else (1, 1, 1, 1),
        (lambda b, n, iq: (b, n, 0, 0)) if st.has_mq else zero4,
    )
    mks = pl.BlockSpec(
        (1, st.nk, C, C) if st.has_mk else (1, 1, 1, 1),
        (lambda b, n, iq: (b, 0, 0, 0)) if st.has_mk else zero4,
    )
    mos = pl.BlockSpec(
        (1, st.nqb, C, C) if st.has_mo else (1, 1, 1, 1),
        (lambda b, n, iq: (b, n, 0, 0)) if st.has_mo else zero4,
    )
    rq = pl.BlockSpec(
        (1, st.bq, C) if st.has_rotq else (1, 1, 1),
        (lambda b, n, iq: (b, n * nqs + iq, 0)) if st.has_rotq else zero3,
    )
    rk = pl.BlockSpec(
        (1, Tk, C) if st.has_rotk else (1, 1, 1),
        (lambda b, n, iq: (b, 0, 0)) if st.has_rotk else zero3,
    )
    return grid, [qs, ks, ks, mqs, mks, mos, rq, rq, rk, rk], qs, ks, mqs, mks, mos


def _fwd_call(st: _Static, qB, kB, vB, mq, mk, mo, cq, sq, ck, sk):
    B, Tq, D = qB.shape
    Tk = kB.shape[1]
    C = D // st.heads
    grid, in_specs, qs, _, _, _, _ = _specs(st, B, Tq, Tk, D, C)
    o_shape = jax.ShapeDtypeStruct(qB.shape, qB.dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, st=st),
        grid=grid,
        in_specs=in_specs,
        out_specs=(qs, qs) if st.store_z else qs,
        out_shape=(o_shape, o_shape) if st.store_z else o_shape,
        compiler_params=None if st.interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=st.interpret,
    )(qB, kB, vB, mq, mk, mo, cq, sq, ck, sk)


def _bwd_call(st: _Static, qB, kB, vB, mq, mk, mo, cq, sq, ck, sk, g, z):
    B, Tq, D = qB.shape
    Tk = kB.shape[1]
    C = D // st.heads
    grid, in_specs, qs, ks, mqs, mks, mos = _specs(st, B, Tq, Tk, D, C)
    zs = qs if st.store_z else pl.BlockSpec((1, 1, 1), lambda b, n, iq: (0, 0, 0))
    dq, dk, dv, dmq, dmk, dmo = pl.pallas_call(
        functools.partial(_bwd_kernel, st=st),
        grid=grid,
        in_specs=in_specs + [qs, zs],
        out_specs=(qs, ks, ks, mqs, mks, mos),
        out_shape=(
            jax.ShapeDtypeStruct(qB.shape, jnp.float32),
            jax.ShapeDtypeStruct(kB.shape, jnp.float32),
            jax.ShapeDtypeStruct(vB.shape, jnp.float32),
            jax.ShapeDtypeStruct(mq.shape, jnp.float32),
            jax.ShapeDtypeStruct(mk.shape, jnp.float32),
            jax.ShapeDtypeStruct(mo.shape, jnp.float32),
        ),
        compiler_params=None if st.interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=st.interpret,
    )(qB, kB, vB, mq, mk, mo, cq, sq, ck, sk, g, z)
    return dq, dk, dv, dmq, dmk, dmo


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core(st: _Static, qB, kB, vB, mq, mk, mo, cq, sq, ck, sk):
    out = _fwd_call(st, qB, kB, vB, mq, mk, mo, cq, sq, ck, sk)
    return out[0] if st.store_z else out


def _core_fwd(st, qB, kB, vB, mq, mk, mo, cq, sq, ck, sk):
    out = _fwd_call(st, qB, kB, vB, mq, mk, mo, cq, sq, ck, sk)
    if st.store_z:
        out, z = out
    else:
        z = jnp.zeros((1, 1, 1), qB.dtype)
    return out, (qB, kB, vB, mq, mk, mo, cq, sq, ck, sk, z)


def _core_bwd(st, res, g):
    qB, kB, vB, mq, mk, mo, cq, sq, ck, sk, z = res
    dq, dk, dv, dmq, dmk, dmo = _bwd_call(
        st, qB, kB, vB, mq, mk, mo, cq, sq, ck, sk, g.astype(qB.dtype), z
    )
    # rotor tables are functions of data coordinates only — zero cotangents
    return (
        dq.astype(qB.dtype),
        dk.astype(kB.dtype),
        dv.astype(vB.dtype),
        dmq.astype(mq.dtype) if st.has_mq else jnp.zeros_like(mq),
        dmk.astype(mk.dtype) if st.has_mk else jnp.zeros_like(mk),
        dmo.astype(mo.dtype) if st.has_mo else jnp.zeros_like(mo),
        jnp.zeros_like(cq),
        jnp.zeros_like(sq),
        jnp.zeros_like(ck),
        jnp.zeros_like(sk),
    )


_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def _expand_rotors(rotors, fd):
    """Identity-padded (cos, sin) [B, T, C/2] -> per-lane [B, T, C]
    (each rotor's cos/sin duplicated onto both lanes of its pair)."""
    cos, sin = _fw_rotors(rotors, fd, jnp.float32)
    return jnp.repeat(cos, 2, axis=-1), jnp.repeat(sin, 2, axis=-1)


def _q_blocking(Tq: int, nq: int):
    """(views_per_block, block_tokens) for the query side, or None.

    Aligned views (token count % 8 == 0) get one view per block, split by
    SPLIT_BQ when larger than MAX_BQ. Misaligned views fall back to one
    whole-tensor block (all views, per-view row slices in-kernel) when the
    total fits a block.
    """
    tnq = Tq // nq
    if Tq % 8 == 0 and Tq <= _WHOLE_BQ:
        return nq, Tq
    if tnq % 8 == 0:
        if tnq <= MAX_BQ:
            return 1, tnq
        if tnq % SPLIT_BQ == 0:
            return 1, SPLIT_BQ
    if Tq % 8 == 0 and Tq <= MAX_BQ:
        return nq, Tq
    return None


def v2_supported(reps: GeomReps, args: GTAArgs, Tq: int, Tk: int) -> bool:
    """Whether the fully-fused kernel covers this call.

    Falls back (ops/gta_pallas.py) for: t2 / euclid / elementwise_mul /
    per-token SE(3) tables (ray_to_se3 queries), odd-aligned spans, keys
    beyond the whole-KV VMEM limit or off 8-row tiles, and query spans
    that fit neither per-view nor whole-tensor blocking.
    """
    if args.elementwise_mul or not _blockdiag_ok(reps, args):
        return False
    if Tk > MAX_TK or Tk % 8:
        return False
    nq, nk = _view_counts(reps)
    nq = nq or 1
    nk = nk or 1
    if Tq % nq or Tk % nk:
        return False
    return _q_blocking(Tq, nq) is not None


def fused_gta_attention_v2(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    reps: GeomReps,
    args: GTAArgs,
    trans_coeff: Optional[jnp.ndarray],
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """GTA attention over [B, H, T, C] with rep transforms fused in-kernel.

    The [B,H,T,C] <-> [B,T,H*C] reshapes here cancel against the head
    split/merge transposes in the caller (XLA folds them), so the kernel
    reads the projection outputs with no materialized layout change.
    """
    fd = args.f_dims
    C = fd.total
    B, H, Tq, _ = q.shape
    Tk = k.shape[2]
    nq, nk = _view_counts(reps)
    nq = nq or 1
    nk = nk or 1
    nqb, bq = _q_blocking(Tq, nq)

    f32 = jnp.float32
    Bq = _blockdiag_mat(reps, args, trans_coeff, "q", f32)
    Bk = _blockdiag_mat(reps, args, trans_coeff, "k", f32)
    Bo = _blockdiag_mat(reps, args, trans_coeff, "out", f32) if args.v_transform else None
    # row-vector form: x_row @ M with M = (left matrix)^T
    ph4 = jnp.zeros((1, 1, 1, 1), f32)
    ph3 = jnp.zeros((1, 1, 1), f32)
    mq = jnp.swapaxes(Bq, -1, -2) if Bq is not None else ph4
    mk = jnp.swapaxes(Bk, -1, -2) if Bk is not None else ph4
    mo = jnp.swapaxes(Bo, -1, -2) if Bo is not None else ph4
    if reps.so2_q is not None:
        cq, sq = _expand_rotors(reps.so2_q, fd)
    else:
        cq, sq = ph3, ph3
    if reps.so2_k is not None:
        ck, sk = _expand_rotors(reps.so2_k, fd)
    else:
        ck, sk = ph3, ph3

    st = _Static(
        scale=float(scale),
        heads=H,
        nq=nq,
        nqb=nqb,
        nk=nk,
        bq=bq,
        v_transform=bool(args.v_transform),
        has_mq=Bq is not None,
        has_mk=Bk is not None,
        has_mo=Bo is not None,
        has_rotq=reps.so2_q is not None,
        has_rotk=reps.so2_k is not None,
        interpret=interpret,
        store_z=bool(args.v_transform) and Bo is not None,
    )
    if TRACE_FLOPS:
        FLOP_TRACE.append(_kernel_flops(st, B, Tq, Tk, C))
    qB = jnp.swapaxes(q, 1, 2).reshape(B, Tq, H * C)
    kB = jnp.swapaxes(k, 1, 2).reshape(B, Tk, H * C)
    vB = jnp.swapaxes(v, 1, 2).reshape(B, Tk, H * C)
    out = _core(st, qB, kB, vB, mq, mk, mo, cq, sq, ck, sk)
    return jnp.swapaxes(out.reshape(B, Tq, H, C), 1, 2)
