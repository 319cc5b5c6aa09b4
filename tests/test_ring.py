"""Ring attention (view-sharded KV) vs the single-device oracle.

Runs on the 8-virtual-device CPU mesh (conftest). The ring result must
equal full softmax attention / GTA attention to fp32 round-off — the
online-softmax recurrence is exact, not an approximation.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gta_tpu.config import FDims, GTAArgs
from gta_tpu.ops.attention import dot_product_attention
from gta_tpu.ops.gta import gta_attention
from gta_tpu.ops.reps import decoder_reps, encoder_reps
from gta_tpu.parallel.ring import ring_attention, ring_gta_attention, ring_rep_specs
from tests.conftest import random_se3

B, H, NV, TPV, C = 2, 2, 4, 6, 16
T = NV * TPV
NDEV = 4


def _mesh():
    return Mesh(np.asarray(jax.devices()[:NDEV]), ("ring",))


def test_ring_attention_matches_full(rng):
    """KV sharded, q replicated: ring == full attention on gathered arrays."""
    q = jnp.asarray(rng.randn(B, H, 10, C).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, T, C).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, T, C).astype(np.float32))
    scale = 1.0 / np.sqrt(C)

    want, _ = dot_product_attention(q, k, v, scale=scale)

    kv_spec = P(None, None, "ring", None)
    f = jax.jit(
        jax.shard_map(
            lambda q, k, v: ring_attention(q, k, v, scale, "ring"),
            mesh=_mesh(),
            in_specs=(P(), kv_spec, kv_spec),
            out_specs=P(),
            check_vma=False,
        )
    )
    got = f(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_ring_attention_self_sharded_queries(rng):
    """Self-attention layout: q AND kv sharded over the same axis; the output
    comes back sharded over queries (each device owns its views' rows)."""
    q = jnp.asarray(rng.randn(B, H, T, C).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, T, C).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, T, C).astype(np.float32))
    scale = 0.3

    want, _ = dot_product_attention(q, k, v, scale=scale)

    tok = P(None, None, "ring", None)
    f = jax.jit(
        jax.shard_map(
            lambda q, k, v: ring_attention(q, k, v, scale, "ring"),
            mesh=_mesh(),
            in_specs=(tok, tok, tok),
            out_specs=tok,
        )
    )
    got = f(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


FULL_ARGS = GTAArgs(f_dims=FDims(triv=2, se3=8, so3=8, so2=8, t2=6), so2=2, so3=2)


def test_ring_gta_matches_oracle(rng):
    """Decoder-style cross attention: per-view reps ride with their KV shard;
    ring GTA equals the einsum oracle."""
    args = FULL_ARGS
    Cd = args.f_dims.total
    coord = jnp.asarray(rng.rand(B, NV, TPV, 2), jnp.float32)
    transforms = jnp.asarray(np.stack([random_se3(rng, NV) for _ in range(B)]))
    rays = rng.randn(B, NV, TPV, 3).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)

    NQ, TQ = 2, 5
    t_coord = jnp.asarray(rng.rand(B, NQ, TQ, 2), jnp.float32)
    t_transforms = jnp.asarray(np.stack([random_se3(rng, NQ) for _ in range(B)]))

    enc = encoder_reps(args, coord, transforms, jnp.asarray(rays))
    dec = decoder_reps(
        args,
        target_coord=t_coord,
        target_transforms=t_transforms,
        input_coord=coord,
        input_transforms=transforms,
        enc=enc,
    )

    q = jnp.asarray(rng.randn(B, H, NQ * TQ, Cd).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, H, T, Cd).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, T, Cd).astype(np.float32) * 0.3)
    tc = jnp.asarray(0.01)
    scale = 1.0

    want, _ = gta_attention(
        q, k, v, functools.partial(dot_product_attention, scale=scale),
        dec, args, tc,
    )

    kv_spec = P(None, None, "ring", None)
    f = jax.jit(
        jax.shard_map(
            lambda q, k, v, reps, tc: ring_gta_attention(
                q, k, v, reps, args, tc, scale, "ring"
            ),
            mesh=_mesh(),
            in_specs=(P(), kv_spec, kv_spec, ring_rep_specs(dec, "ring"), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    got = f(q, k, v, dec, tc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
