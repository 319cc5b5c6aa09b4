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


def test_ring_gta_grad_matches_oracle(rng):
    """Gradients THROUGH the ring (scan + ppermute) equal the oracle's —
    the capability check that makes ring attention trainable, not a demo."""
    args = FULL_ARGS
    Cd = args.f_dims.total
    coord = jnp.asarray(rng.rand(B, NV, TPV, 2), jnp.float32)
    transforms = jnp.asarray(np.stack([random_se3(rng, NV) for _ in range(B)]))
    rays = rng.randn(B, NV, TPV, 3).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    enc = encoder_reps(args, coord, transforms, jnp.asarray(rays))

    q = jnp.asarray(rng.randn(B, H, T, Cd).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, H, T, Cd).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, T, Cd).astype(np.float32) * 0.3)
    tc = jnp.asarray(0.01)
    scale = 0.5
    tgt = jnp.asarray(rng.randn(B, H, T, Cd).astype(np.float32))

    def loss_dense(ops):
        q, k, v, tc = ops
        out, _ = gta_attention(
            q, k, v, functools.partial(dot_product_attention, scale=scale),
            enc, args, tc,
        )
        return jnp.mean((out - tgt) ** 2)

    from gta_tpu.parallel.ring import _full_rep_specs

    tok = P(None, None, "ring", None)
    ring_fn = jax.shard_map(
        lambda q, k, v, reps, tc: ring_gta_attention(
            q, k, v, reps, args, tc, scale, "ring"
        ),
        mesh=_mesh(),
        # self-attention layout: q sharded over the ring too, so the q-side
        # per-view/per-token rep tables shard alongside it
        in_specs=(tok, tok, tok, _full_rep_specs(enc, None, "ring", shard_q=True), P()),
        out_specs=tok,
        check_vma=False,
    )

    def loss_ring(ops):
        q, k, v, tc = ops
        # self-attention layout: q also sharded; q-side per-view tables must
        # shard with it
        return jnp.mean((ring_fn(q, k, v, enc, tc) - tgt) ** 2)

    ld, gd = jax.value_and_grad(loss_dense)((q, k, v, tc))
    lr_, gr = jax.jit(jax.value_and_grad(loss_ring))((q, k, v, tc))
    np.testing.assert_allclose(float(lr_), float(ld), rtol=1e-5)
    for a, b, name in zip(gr, gd, ("q", "k", "v", "tc")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg=f"grad mismatch for {name}",
        )


def test_ring_training_step_matches_dense():
    """Full Trainer train_step with --n-seq style ring routing (config flag +
    ambient mesh) vs the plain dense trainer: same loss, same updated params."""
    import dataclasses

    from gta_tpu.config import with_ring_attention
    from gta_tpu.parallel.mesh import make_mesh, shard_batch, replicate
    from gta_tpu.train.trainer import Trainer
    from tests.test_trainer import make_batch, tiny_config

    cfg = tiny_config(batch_size=4)
    batch = make_batch(cfg, 4)

    dense = Trainer(cfg)
    state0 = dense.init_state(batch, seed=0)
    params0 = jax.tree.map(np.asarray, state0.params)  # dense step donates state0
    sd, md = dense.train_step(state0, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(n_data=2, n_seq=2)  # 2 input views ring over seq=2
    prev = jax.sharding.get_mesh()
    jax.set_mesh(mesh)
    try:
        ring_tr = Trainer(with_ring_attention(cfg), mesh=mesh)
        state0r = ring_tr.init_state(batch, seed=0)
        state0r = state0r.replace(
            params=replicate(params0, mesh),
            opt_state=replicate(state0r.opt_state, mesh),
        )
        br = shard_batch(batch, mesh)
        sr, mr = ring_tr.train_step(state0r, br, jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(mr["loss"]), float(md["loss"]), rtol=1e-5)
        for pa, pb in zip(
            jax.tree.leaves(sr.params), jax.tree.leaves(sd.params)
        ):
            np.testing.assert_allclose(
                np.asarray(pa), np.asarray(pb), atol=3e-5
            )
    finally:
        jax.set_mesh(prev)


def test_ring_falls_back_on_non_divisible_batch():
    """Batches whose size doesn't divide the mesh data axis (odd eval
    batches, visualize's min(6, host_batch), --speed_test splits) must run
    replicated instead of crashing inside the in-model shard_map
    (parallel/ring.shapes_divide guard)."""
    from gta_tpu.config import with_ring_attention
    from gta_tpu.parallel.mesh import make_mesh
    from gta_tpu.train.trainer import Trainer
    from tests.test_trainer import make_batch, tiny_config

    cfg = tiny_config(batch_size=4)
    batch = make_batch(cfg, 3)  # 3 rows: not divisible by n_data=2

    dense = Trainer(cfg)
    state = dense.init_state(batch, seed=0)
    want, _ = dense.model.apply(state.params, batch, True)

    mesh = make_mesh(n_data=2, n_seq=2)
    prev = jax.sharding.get_mesh()
    jax.set_mesh(mesh)
    try:
        ring_tr = Trainer(with_ring_attention(cfg), mesh=mesh)
        got, _ = ring_tr.model.apply(state.params, batch, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    finally:
        jax.set_mesh(prev)
