"""Invariance/equivariance property tests for the GTA attention op.

The defining property of GTA (paper §3 / reference gta.py): attention
similarities depend only on *relative* geometry, so right-multiplying every
camera extrinsic by a shared rigid transform h (a global change of world
frame) must leave attention weights — and with v_transform, the entire
output — unchanged. The scale_mask is a similarity conjugation, so this
holds exactly for any trans_coeff.
"""

import functools

import numpy as np
import jax.numpy as jnp
import pytest

from gta_tpu.config import FDims, GTAArgs
from gta_tpu.ops.reps import encoder_reps, decoder_reps
from gta_tpu.ops.gta import gta_attention
from gta_tpu.ops.attention import dot_product_attention, euclid_attention
from tests.conftest import random_se3

B, H, NV, TPV = 2, 2, 3, 4  # batch, heads, views, tokens/view
T = NV * TPV


def _geom(rng, args, transforms=None):
    coord = jnp.asarray(rng.rand(B, NV, TPV, 2), jnp.float32)
    if transforms is None:
        transforms = jnp.asarray(np.stack([random_se3(rng, NV) for _ in range(B)]))
    rays = rng.randn(B, NV, TPV, 3).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    return coord, transforms, jnp.asarray(rays)


def _qkv(rng, C):
    mk = lambda: jnp.asarray(rng.randn(B, H, T, C).astype(np.float32) * 0.3)
    return mk(), mk(), mk()


def _run(args, coord, transforms, rays, q, k, v, trans_coeff=0.01, euclid=False):
    reps = encoder_reps(args, coord, transforms, rays)
    attn_fn = functools.partial(
        euclid_attention if euclid else dot_product_attention, scale=1.0
    )
    out, attn = gta_attention(
        q, k, v, attn_fn, reps, args, jnp.asarray(trans_coeff)
    )
    return np.asarray(out), np.asarray(attn)


FULL_ARGS = GTAArgs(
    f_dims=FDims(triv=2, se3=8, so3=8, so2=8, t2=6),
    so2=2,
    so3=2,
)


@pytest.mark.parametrize("tc", [1.0, 0.01])
def test_global_frame_invariance(rng, tc):
    """E_i -> E_i h for all views leaves attention AND output unchanged."""
    args = FULL_ARGS
    coord, transforms, rays = _geom(rng, args)
    q, k, v = _qkv(rng, args.f_dims.total)

    out0, attn0 = _run(args, coord, transforms, rays, q, k, v, tc)

    h = jnp.asarray(random_se3(rng, 1)[0])
    transforms_h = jnp.einsum("bnij,jk->bnik", transforms, h)
    out1, attn1 = _run(args, coord, transforms_h, rays, q, k, v, tc)

    np.testing.assert_allclose(attn1, attn0, atol=2e-4)
    np.testing.assert_allclose(out1, out0, atol=2e-4)


def test_identity_transforms_are_noop_for_se3(rng):
    """With all-identity extrinsics and no coord groups, GTA == plain attention."""
    args = GTAArgs(f_dims=FDims(se3=8))
    coord, _, rays = _geom(rng, args)
    transforms = jnp.broadcast_to(jnp.eye(4), (B, NV, 4, 4))
    q, k, v = _qkv(rng, args.f_dims.total)
    out, attn = _run(args, coord, transforms, rays, q, k, v, 1.0)
    want, attn_w = dot_product_attention(q, k, v, scale=1.0)
    np.testing.assert_allclose(out, np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(attn, np.asarray(attn_w), atol=1e-5)


def test_rope_variant_weights_invariant(rng):
    """v_transform=False: attention weights still frame-invariant."""
    args = GTAArgs(
        f_dims=FDims(triv=2, se3=8, so2=8), so2=2, v_transform=False
    )
    coord, transforms, rays = _geom(rng, args)
    q, k, v = _qkv(rng, args.f_dims.total)
    _, attn0 = _run(args, coord, transforms, rays, q, k, v)
    h = jnp.asarray(random_se3(rng, 1)[0])
    transforms_h = jnp.einsum("bnij,jk->bnik", transforms, h)
    _, attn1 = _run(args, coord, transforms_h, rays, q, k, v)
    np.testing.assert_allclose(attn1, attn0, atol=2e-4)


@pytest.mark.parametrize("tc", [1.0, 0.5])
def test_euclid_variant_invariance(rng, tc):
    args = GTAArgs(f_dims=FDims(se3=9, so2=8), so2=2, euclid_sim=True)
    coord, transforms, rays = _geom(rng, args)
    q, k, v = _qkv(rng, args.f_dims.total)
    out0, attn0 = _run(args, coord, transforms, rays, q, k, v, tc, euclid=True)
    h = jnp.asarray(random_se3(rng, 1)[0])
    transforms_h = jnp.einsum("bnij,jk->bnik", transforms, h)
    out1, attn1 = _run(args, coord, transforms_h, rays, q, k, v, tc, euclid=True)
    np.testing.assert_allclose(attn1, attn0, atol=2e-4)
    np.testing.assert_allclose(out1, out0, atol=2e-4)


def test_so2_shift_equivariance(rng):
    """Shifting all coords by a constant leaves attention weights unchanged."""
    args = GTAArgs(f_dims=FDims(so2=8), so2=2)
    coord, transforms, rays = _geom(rng, args)
    q, k, v = _qkv(rng, args.f_dims.total)
    _, attn0 = _run(args, coord, transforms, rays, q, k, v)
    shift = jnp.asarray(rng.rand(1, 1, 1, 2), jnp.float32)
    _, attn1 = _run(args, coord + shift, transforms, rays, q, k, v)
    np.testing.assert_allclose(attn1, attn0, atol=2e-4)


def test_decoder_reps_reuse_key_side(rng):
    """Cross-attention reps reuse the encoder's key tables (decoder.py:311)."""
    args = FULL_ARGS
    coord, transforms, rays = _geom(rng, args)
    t_coord = jnp.asarray(rng.rand(B, 2, 5, 2), jnp.float32)
    t_transforms = jnp.asarray(np.stack([random_se3(rng, 2) for _ in range(B)]))
    enc = encoder_reps(args, coord, transforms, rays)
    dec = decoder_reps(
        args,
        target_coord=t_coord,
        target_transforms=t_transforms,
        input_coord=coord,
        input_transforms=transforms,
        enc=enc,
    )
    assert dec.se3_k is enc.se3_k
    assert dec.so3_k is enc.so3_k
    assert dec.so2_k is enc.so2_k
    # and without enc, it recomputes to the same values
    dec2 = decoder_reps(
        args,
        target_coord=t_coord,
        target_transforms=t_transforms,
        input_coord=coord,
        input_transforms=transforms,
        enc=None,
    )
    np.testing.assert_allclose(np.asarray(dec2.se3_k), np.asarray(dec.se3_k), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dec2.so2_k[0]), np.asarray(dec.so2_k[0]), atol=1e-6)


def test_cross_attention_invariance(rng):
    """Decoder-style cross attention: global frame change on both sides."""
    args = FULL_ARGS
    coord, transforms, rays = _geom(rng, args)
    NQ, TQ = 2, 6
    t_coord = jnp.asarray(rng.rand(B, NQ, TQ, 2), jnp.float32)
    t_transforms = jnp.asarray(np.stack([random_se3(rng, NQ) for _ in range(B)]))
    C = args.f_dims.total
    q = jnp.asarray(rng.randn(B, H, NQ * TQ, C).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, H, T, C).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, T, C).astype(np.float32) * 0.3)

    def run(tfq, tfk):
        enc = encoder_reps(args, coord, tfk, rays)
        dec = decoder_reps(
            args,
            target_coord=t_coord,
            target_transforms=tfq,
            input_coord=coord,
            input_transforms=tfk,
            enc=enc,
        )
        attn_fn = functools.partial(dot_product_attention, scale=1.0)
        out, attn = gta_attention(q, k, v, attn_fn, dec, args, jnp.asarray(0.01))
        return np.asarray(out), np.asarray(attn)

    out0, attn0 = run(t_transforms, transforms)
    h = jnp.asarray(random_se3(rng, 1)[0])
    out1, attn1 = run(
        jnp.einsum("bnij,jk->bnik", t_transforms, h),
        jnp.einsum("bnij,jk->bnik", transforms, h),
    )
    np.testing.assert_allclose(attn1, attn0, atol=2e-4)
    np.testing.assert_allclose(out1, out0, atol=2e-4)


class TestFullwidthPath:
    """The full-width rep application (gta.py `_fw_apply`) must match the
    slice/einsum/concat oracle on every applicable group mix. Full-width is
    an opt-in documented *negative result* (measured slower on the v5e —
    see the note in ops/gta.py), but it stays correct and tested."""

    MIXES = [
        GTAArgs(f_dims=FDims(se3=32, so2=32), so2=8),          # flagship CLEVR
        GTAArgs(f_dims=FDims(triv=4, se3=8, so2=8), so2=2),
        GTAArgs(f_dims=FDims(so2=16), so2=4),
        GTAArgs(f_dims=FDims(se3=16)),
        GTAArgs(f_dims=FDims(triv=4, se3=8, so2=8), so2=2, v_transform=False),
        GTAArgs(f_dims=FDims(se3=8, so2=8), so2=2, ray_to_se3=True),
    ]

    @pytest.mark.parametrize("args", MIXES, ids=lambda a: repr(a.f_dims))
    def test_transform_matches_sliced(self, rng, args):
        from gta_tpu.ops.gta import (
            _fullwidth_ok,
            gta_transform_qkv,
            gta_untransform_out,
        )

        assert _fullwidth_ok(args)
        coord, transforms, rays = _geom(rng, args)
        q, k, v = _qkv(rng, args.f_dims.total)
        reps = encoder_reps(args, coord, transforms, rays)
        tc = jnp.asarray(0.1)

        got = gta_transform_qkv(q, k, v, reps, args, tc, impl="fullwidth")
        want = gta_transform_qkv(q, k, v, reps, args, tc, impl="sliced")
        for g, w, nm in zip(got, want, "qkv"):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-5, err_msg=nm
            )

        if args.v_transform:
            o = jnp.asarray(rng.randn(B, H, T, args.f_dims.total).astype(np.float32))
            go = gta_untransform_out(o, reps, args, tc, impl="fullwidth")
            wo = gta_untransform_out(o, reps, args, tc, impl="sliced")
            np.testing.assert_allclose(np.asarray(go), np.asarray(wo), atol=1e-5)

    def test_not_applicable_mixes_fall_back(self):
        from gta_tpu.ops.gta import _fullwidth_ok

        assert not _fullwidth_ok(FULL_ARGS)  # so3/t2 present
        assert not _fullwidth_ok(
            GTAArgs(f_dims=FDims(se3=9, so2=8), so2=2, euclid_sim=True)
        )
        # misaligned se3 start breaks the vec4 grouping
        assert not _fullwidth_ok(GTAArgs(f_dims=FDims(triv=2, se3=8), so2=2))


class TestBlockdiagPath:
    """The block-diagonal per-view matmul + full-width rotor form (the
    'auto' default where applicable) must match the slice/einsum/concat
    form exactly, values AND gradients, on every applicable group mix."""

    MIXES = [
        GTAArgs(f_dims=FDims(se3=32, so2=32), so2=8),            # flagship CLEVR
        GTAArgs(f_dims=FDims(triv=4, se3=8, so2=8), so2=2),
        GTAArgs(f_dims=FDims(so2=16), so2=4),                    # rotors only
        GTAArgs(f_dims=FDims(se3=16)),                           # matrix only
        GTAArgs(f_dims=FDims(se3=16, so2=8, so3=16), so2=2, so3=2),  # + Wigner
        GTAArgs(f_dims=FDims(triv=4, se3=8, so2=8), so2=2, v_transform=False),
    ]

    @pytest.mark.parametrize("args", MIXES, ids=lambda a: repr(a.f_dims))
    def test_matches_sliced(self, rng, args):
        import jax

        from gta_tpu.ops.gta import (
            _blockdiag_ok,
            gta_transform_qkv,
            gta_untransform_out,
        )

        coord, transforms, rays = _geom(rng, args)
        q, k, v = _qkv(rng, args.f_dims.total)
        reps = encoder_reps(args, coord, transforms, rays)
        assert _blockdiag_ok(reps, args)
        tc = jnp.asarray(0.1)

        got = gta_transform_qkv(q, k, v, reps, args, tc, impl="blockdiag")
        want = gta_transform_qkv(q, k, v, reps, args, tc, impl="sliced")
        for g, w, nm in zip(got, want, "qkv"):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=2e-5, err_msg=nm
            )

        # gradients through the transform (incl. trans_coeff)
        def loss(impl, q, k, v, tc):
            qt, kt, vt = gta_transform_qkv(q, k, v, reps, args, tc, impl=impl)
            return jnp.sum(qt**2) + jnp.sum(kt * vt)

        g_bd = jax.grad(functools.partial(loss, "blockdiag"), (0, 1, 2, 3))(q, k, v, tc)
        g_sl = jax.grad(functools.partial(loss, "sliced"), (0, 1, 2, 3))(q, k, v, tc)
        for a, b in zip(g_sl, g_bd):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-4)

        if args.v_transform:
            o = jnp.asarray(rng.randn(B, H, T, args.f_dims.total).astype(np.float32))
            go = gta_untransform_out(o, reps, args, tc, impl="blockdiag")
            wo = gta_untransform_out(o, reps, args, tc, impl="sliced")
            np.testing.assert_allclose(np.asarray(go), np.asarray(wo), atol=2e-5)

    def test_not_applicable_mixes_fall_back(self, rng):
        from gta_tpu.ops.gta import _blockdiag_ok

        args = FULL_ARGS  # t2 present
        coord, transforms, rays = _geom(rng, args)
        reps = encoder_reps(args, coord, transforms, rays)
        assert not _blockdiag_ok(reps, args)

        # per-token SE(3) tables (ray_to_se3 decoder queries) cannot ride a
        # per-view matrix
        args2 = GTAArgs(f_dims=FDims(se3=8, so2=8), so2=2, ray_to_se3=True)
        coord, transforms, rays = _geom(rng, args2)
        NQ, TQ = 2, 6
        t_coord = jnp.asarray(rng.rand(B, NQ, TQ, 2), jnp.float32)
        t_transforms = jnp.asarray(np.stack([random_se3(rng, NQ) for _ in range(B)]))
        t_rays = rng.randn(B, NQ, TQ, 3).astype(np.float32)
        t_rays /= np.linalg.norm(t_rays, axis=-1, keepdims=True)
        enc = encoder_reps(args2, coord, transforms, rays)
        dec = decoder_reps(
            args2,
            target_coord=t_coord,
            target_transforms=t_transforms,
            target_rays=jnp.asarray(t_rays),
            input_coord=coord,
            input_transforms=transforms,
            enc=enc,
        )
        if dec.se3_q is not None and dec.se3_q.ndim == 5:
            assert not _blockdiag_ok(dec, args2)
