"""Trainer tests: loss decreases when overfitting, eval/render shapes, and
data-parallel sharding equivalence on the 8-device CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gta_tpu.config import (
    AttnConfig,
    Config,
    DataConfig,
    DecoderConfig,
    EncoderConfig,
    FDims,
    GTAArgs,
    ModelConfig,
    TrainConfig,
)
from gta_tpu.data.synthetic import SyntheticScenes, collate
from gta_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from gta_tpu.train.trainer import Trainer

GTA_ATTN = AttnConfig(method="gta", gta=GTAArgs(f_dims=FDims(se3=16, so2=16), so2=4))


def tiny_config(batch_size=4, num_points=64):
    return Config(
        data=DataConfig(
            dataset="synthetic",
            num_points=num_points,
            height=32,
            width=32,
            downsample=0,
            downsample_input_coord=3,
            num_input_views=2,
            num_target_views=2,
        ),
        model=ModelConfig(
            model_type="tsrt",
            encoder=EncoderConfig(
                dim=128, attdim=64, heads=2, num_att_blocks=2, emb=None, attn=GTA_ATTN
            ),
            decoder=DecoderConfig(
                dim=48,
                z_dim=64,
                heads=2,
                rmlp_dim=64,
                num_att_blocks=1,
                emb="const",
                attn=GTA_ATTN,
            ),
        ),
        training=TrainConfig(batch_size=batch_size, lr=2e-3, lr_warmup=10, decay_it=100000),
    )


def make_batch(cfg, n, offset=0):
    ds = SyntheticScenes(cfg.data, "train", num_scenes=offset + n)
    return jax.tree.map(jnp.asarray, collate([ds[offset + i] for i in range(n)]))


def test_overfit_loss_decreases():
    cfg = tiny_config()
    tr = Trainer(cfg)
    batch = make_batch(cfg, 4)
    state = tr.init_state(batch)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(30):
        state, m = tr.train_step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, f"no learning: {losses[0]} -> {losses[-1]}"


def test_eval_and_render():
    cfg = tiny_config()
    tr = Trainer(cfg)
    batch = make_batch(cfg, 2)
    state = tr.init_state(batch)
    metrics = tr.evaluate(state.params, [batch])
    assert "psnr" in metrics and np.isfinite(metrics["psnr"])
    img = tr.render_image(state.params, batch, 32, 32, chunk=256)
    assert img.shape == (2, 32, 32, 3)
    assert np.isfinite(img).all()


def test_data_parallel_matches_single_device():
    """Sharded train step == single-device train step (grad psum correctness)."""
    cfg = tiny_config(batch_size=8)
    tr = Trainer(cfg)
    batch = make_batch(cfg, 8)
    state = tr.init_state(batch)
    rng = jax.random.PRNGKey(1)

    # single device baseline (eval_step only to avoid dropout rng divergence)
    base = tr.eval_step(state.params, batch)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded_batch = shard_batch(batch, mesh)
    sharded_params = replicate(state.params, mesh)
    out = tr.eval_step(sharded_params, sharded_batch)
    np.testing.assert_allclose(np.asarray(out["mse"]), np.asarray(base["mse"]), rtol=2e-4)

    # one sharded train step runs and stays replicated/finite
    state_sh = dataclasses.replace(
        state, params=sharded_params, opt_state=replicate(state.opt_state, mesh)
    ) if dataclasses.is_dataclass(state) else state
    state_sh = state.replace(params=sharded_params, opt_state=replicate(state.opt_state, mesh))
    new_state, m = tr.train_step(state_sh, sharded_batch, rng)
    assert np.isfinite(float(m["loss"]))


def test_mixed_precision_bf16():
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, training=dataclasses.replace(cfg.training, mixed_prec=True))
    tr = Trainer(cfg)
    assert tr.dtype == jnp.bfloat16
    batch = make_batch(cfg, 2)
    state = tr.init_state(batch)
    # params stay fp32
    leaves = jax.tree.leaves(state.params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    state, m = tr.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
