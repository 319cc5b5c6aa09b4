"""Parity tests: fused Pallas GTA kernel vs the einsum oracle (interpret mode)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gta_tpu.config import FDims, GTAArgs
from gta_tpu.ops.attention import dot_product_attention
from gta_tpu.ops.gta import gta_attention
from gta_tpu.ops.gta_pallas import fused_gta_attention
from gta_tpu.ops.reps import encoder_reps
from tests.conftest import random_se3

B, H, NV, TPV = 2, 2, 2, 6
T = NV * TPV
SCALE = 0.35


def _geom(rng, args):
    coord = jnp.asarray(rng.rand(B, NV, TPV, 2), jnp.float32)
    transforms = jnp.asarray(np.stack([random_se3(rng, NV) for _ in range(B)]))
    return encoder_reps(args, coord, transforms, None)


def _qkv(rng, C, tq=T):
    mk = lambda t: jnp.asarray(rng.randn(B, H, t, C).astype(np.float32) * 0.4)
    return mk(tq), mk(T), mk(T)


CONFIGS = {
    "se3_so2": GTAArgs(f_dims=FDims(se3=16, so2=16), so2=4),
    "clevr": GTAArgs(f_dims=FDims(se3=32, so2=32), so2=8),
    "triv_se3": GTAArgs(f_dims=FDims(triv=4, se3=16), so2=0),
    "so3": GTAArgs(f_dims=FDims(se3=16, so2=8, so3=16), so2=2, so3=2),
    "t2": GTAArgs(f_dims=FDims(triv=2, se3=16, t2=6), so2=0),
    "no_vtransform": GTAArgs(f_dims=FDims(se3=16, so2=16), so2=4, v_transform=False),
}


@pytest.mark.parametrize("name", list(CONFIGS))
def test_fused_matches_oracle(rng, name):
    args = CONFIGS[name]
    reps = _geom(rng, args)
    q, k, v = _qkv(rng, args.f_dims.total)
    tc = jnp.asarray(0.3)

    attn_fn = functools.partial(dot_product_attention, scale=SCALE)
    want, _ = gta_attention(q, k, v, attn_fn, reps, args, tc)
    got = fused_gta_attention(q, k, v, reps, args, tc, SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_cross_attention_shapes(rng):
    """Tq != Tk (decoder-style) with non-128-aligned lengths."""
    args = CONFIGS["se3_so2"]
    reps = _geom(rng, args)
    q, k, v = _qkv(rng, args.f_dims.total, tq=150)
    # query side needs its own reps: reuse k-side tables as a stand-in by
    # making the q token count divisible by NV
    from gta_tpu.ops.reps import decoder_reps

    t_coord = jnp.asarray(np.random.RandomState(3).rand(B, NV, 75, 2), jnp.float32)
    t_tf = jnp.asarray(np.stack([random_se3(np.random.RandomState(4), NV) for _ in range(B)]))
    coord = jnp.asarray(np.random.RandomState(5).rand(B, NV, TPV, 2), jnp.float32)
    tf = jnp.asarray(np.stack([random_se3(np.random.RandomState(6), NV) for _ in range(B)]))
    dec = decoder_reps(args, target_coord=t_coord, target_transforms=t_tf,
                       input_coord=coord, input_transforms=tf)
    attn_fn = functools.partial(dot_product_attention, scale=SCALE)
    want, _ = gta_attention(q, k, v, attn_fn, dec, args, jnp.asarray(0.1))
    got = fused_gta_attention(q, k, v, dec, args, jnp.asarray(0.1), SCALE, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_gradients_match(rng):
    args = CONFIGS["se3_so2"]
    reps = _geom(rng, args)
    q, k, v = _qkv(rng, args.f_dims.total)
    tc = jnp.asarray(0.25)

    def loss_oracle(q, k, v, tc):
        attn_fn = functools.partial(dot_product_attention, scale=SCALE)
        out, _ = gta_attention(q, k, v, attn_fn, reps, args, tc)
        return jnp.sum(out**2)

    def loss_fused(q, k, v, tc):
        out = fused_gta_attention(q, k, v, reps, args, tc, SCALE, interpret=True)
        return jnp.sum(out**2)

    g_ref = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(q, k, v, tc)
    g_fl = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, tc)
    for a, b in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-4, rtol=1e-3)
