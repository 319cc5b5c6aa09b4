"""Parity tests for the fully-fused GTA kernel (ops/gta_fused.py).

Values AND gradients must match the einsum oracle (ops/gta.gta_attention)
in interpret mode on every supported group mix, including the decoder
cross-attention shape, the sub-blocked large-view path, and the
whole-tensor path for views off the 8-row tile grid.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gta_tpu.ops.gta_fused as gf
from gta_tpu.config import FDims, GTAArgs
from gta_tpu.ops.attention import dot_product_attention
from gta_tpu.ops.gta import gta_attention
from gta_tpu.ops.gta_fused import fused_gta_attention_v2, v2_supported
from gta_tpu.ops.reps import decoder_reps, encoder_reps
from tests.conftest import random_se3

B, H, NV, TPV = 2, 2, 2, 8
T = NV * TPV
SCALE = 0.35

MIXES = {
    "clevr": GTAArgs(f_dims=FDims(se3=32, so2=32), so2=8),
    "triv_se3_so2": GTAArgs(f_dims=FDims(triv=4, se3=8, so2=8), so2=2),
    "rotors_only": GTAArgs(f_dims=FDims(so2=16), so2=4),
    "se3_only": GTAArgs(f_dims=FDims(se3=16)),
    "wigner": GTAArgs(f_dims=FDims(se3=16, so2=8, so3=16), so2=2, so3=2),
    "no_vtransform": GTAArgs(
        f_dims=FDims(triv=4, se3=8, so2=8), so2=2, v_transform=False
    ),
}


def _geom(rng, args, nv=NV, tpv=TPV):
    coord = jnp.asarray(rng.rand(B, nv, tpv, 2), jnp.float32)
    transforms = jnp.asarray(np.stack([random_se3(rng, nv) for _ in range(B)]))
    return encoder_reps(args, coord, transforms, None)


def _qkv(rng, C, tq=T, tk=T):
    mk = lambda t: jnp.asarray(rng.randn(B, H, t, C).astype(np.float32) * 0.4)
    return mk(tq), mk(tk), mk(tk)


def _grad_check(args, reps, q, k, v, tc, atol=5e-4):
    w = jnp.asarray(
        np.random.RandomState(7).randn(*q.shape[:2], q.shape[2], q.shape[3])
    ).astype(jnp.float32)
    attn_fn = functools.partial(dot_product_attention, scale=SCALE)

    def loss_oracle(q, k, v, tc):
        out, _ = gta_attention(q, k, v, attn_fn, reps, args, tc)
        return jnp.sum(out * w)

    def loss_fused(q, k, v, tc):
        out = fused_gta_attention_v2(q, k, v, reps, args, tc, SCALE, interpret=True)
        return jnp.sum(out * w)

    g_o = jax.grad(loss_oracle, (0, 1, 2, 3))(q, k, v, tc)
    g_f = jax.grad(loss_fused, (0, 1, 2, 3))(q, k, v, tc)
    for a, b, nm in zip(g_o, g_f, ("dq", "dk", "dv", "dtc")):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=atol, rtol=1e-4, err_msg=nm
        )


@pytest.mark.parametrize("name", list(MIXES))
def test_values_match_oracle(rng, name):
    args = MIXES[name]
    reps = _geom(rng, args)
    q, k, v = _qkv(rng, args.f_dims.total)
    assert v2_supported(reps, args, T, T)
    tc = jnp.asarray(0.3)

    attn_fn = functools.partial(dot_product_attention, scale=SCALE)
    want, _ = gta_attention(q, k, v, attn_fn, reps, args, tc)
    got = fused_gta_attention_v2(q, k, v, reps, args, tc, SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


@pytest.mark.parametrize("name", ["clevr", "wigner", "no_vtransform"])
def test_gradients_match_oracle(rng, name):
    args = MIXES[name]
    reps = _geom(rng, args)
    q, k, v = _qkv(rng, args.f_dims.total)
    _grad_check(args, reps, q, k, v, jnp.asarray(0.25))


def test_decoder_cross_attention(rng):
    """Tq != Tk, Nq != Nk, encoder key-rep reuse — the flagship decoder shape."""
    args = MIXES["clevr"]
    nq, tq_per_view = 3, 8
    coord = jnp.asarray(rng.rand(B, NV, TPV, 2), jnp.float32)
    tf = jnp.asarray(np.stack([random_se3(rng, NV) for _ in range(B)]))
    enc = encoder_reps(args, coord, tf, None)
    t_coord = jnp.asarray(rng.rand(B, nq, tq_per_view, 2), jnp.float32)
    t_tf = jnp.asarray(np.stack([random_se3(rng, nq) for _ in range(B)]))
    dec = decoder_reps(
        args,
        target_coord=t_coord,
        target_transforms=t_tf,
        input_coord=coord,
        input_transforms=tf,
        enc=enc,
    )
    tq = nq * tq_per_view
    q, k, v = _qkv(rng, args.f_dims.total, tq=tq, tk=T)
    assert v2_supported(dec, args, tq, T)
    tc = jnp.asarray(0.15)

    attn_fn = functools.partial(dot_product_attention, scale=SCALE)
    want, _ = gta_attention(q, k, v, attn_fn, dec, args, tc)
    got = fused_gta_attention_v2(q, k, v, dec, args, tc, SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
    _grad_check(args, dec, q, k, v, tc)


def test_subblocked_large_view(rng, monkeypatch):
    """Aligned views larger than MAX_BQ split into SPLIT_BQ sub-blocks;
    matrix cotangents accumulated across sub-blocks must still match."""
    monkeypatch.setattr(gf, "MAX_BQ", 8)
    monkeypatch.setattr(gf, "SPLIT_BQ", 8)
    args = MIXES["triv_se3_so2"]
    reps = _geom(rng, args, nv=2, tpv=16)  # 16 tokens/view -> two blocks of 8
    q, k, v = _qkv(rng, args.f_dims.total, tq=32, tk=32)
    assert gf._q_blocking(32, 2) == (1, 8)
    tc = jnp.asarray(0.2)

    attn_fn = functools.partial(dot_product_attention, scale=SCALE)
    want, _ = gta_attention(q, k, v, attn_fn, reps, args, tc)
    got = fused_gta_attention_v2(q, k, v, reps, args, tc, SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
    _grad_check(args, reps, q, k, v, tc)


def test_whole_block_misaligned_views(rng):
    """Views off the 8-row tile grid (CLEVR encoder: 300/view) ride one
    whole-tensor block with per-view row slices in-kernel."""
    args = MIXES["clevr"]
    reps = _geom(rng, args, nv=4, tpv=6)  # 6 tokens/view, total 24 % 8 == 0
    q, k, v = _qkv(rng, args.f_dims.total, tq=24, tk=24)
    assert gf._q_blocking(24, 4) == (4, 24)
    assert v2_supported(reps, args, 24, 24)
    tc = jnp.asarray(0.3)

    attn_fn = functools.partial(dot_product_attention, scale=SCALE)
    want, _ = gta_attention(q, k, v, attn_fn, reps, args, tc)
    got = fused_gta_attention_v2(q, k, v, reps, args, tc, SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
    _grad_check(args, reps, q, k, v, tc)


def test_unsupported_mixes(rng):
    t2 = GTAArgs(f_dims=FDims(triv=2, se3=16, t2=6))
    coord = jnp.asarray(rng.rand(B, NV, TPV, 2), jnp.float32)
    tf = jnp.asarray(np.stack([random_se3(rng, NV) for _ in range(B)]))
    reps = encoder_reps(t2, coord, tf, None)
    assert not v2_supported(reps, t2, T, T)

    ok = MIXES["clevr"]
    reps2 = _geom(rng, ok)
    # indivisible query token count
    assert not v2_supported(reps2, ok, T + 2, T)
    # keys beyond the whole-KV VMEM limit / off the 8-row tile grid
    assert not v2_supported(reps2, ok, T, gf.MAX_TK + 8)
    assert not v2_supported(reps2, ok, T, T - 2)
    # misaligned views whose total is also off-tile
    reps3 = _geom(rng, ok, nv=2, tpv=6)
    assert not v2_supported(reps3, ok, 12, T)
