"""Gradient accumulation: scanned-microbatch grads == full-batch grads.

training.grad_accum splits each global batch into equal microbatches inside
the jit step (trainer._grads_fn) so peak activation memory scales with the
microbatch — one chip trains at any reference global batch (the reference
only reaches large batches by adding GPUs, reference train.py:110). With
equal microbatch sizes the averaged-mean loss/grads are mathematically the
full-batch values, so one optimizer step must match to fp32 reassociation.
"""

import dataclasses

import numpy as np
import jax
import pytest

from gta_tpu.parallel.mesh import make_mesh, shard_batch
from gta_tpu.train.trainer import Trainer
from tests.test_trainer import make_batch, tiny_config


def _with_accum(cfg, accum):
    return dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, grad_accum=accum)
    )


def _leaf_allclose(a, b, rtol=2e-4, atol=2e-6):
    # Structure must match before zipping leaves — otherwise extra trailing
    # leaves in either tree would be silently skipped and the comparison
    # could vacuously pass.
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for pa, (path, pb) in zip(
        jax.tree.leaves(a), jax.tree_util.tree_leaves_with_path(b)
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path),
        )


def test_grad_accum_yaml_ingest():
    from gta_tpu.config import config_from_dict

    cfg = config_from_dict({"training": {"grad_accum": 4}})
    assert cfg.training.grad_accum == 4
    assert config_from_dict({}).training.grad_accum == 1
    for bad in (0, -2):
        with pytest.raises(ValueError, match="grad_accum"):
            config_from_dict({"training": {"grad_accum": bad}})


def test_grad_accum_matches_full_batch():
    cfg = tiny_config(batch_size=8)
    batch = make_batch(cfg, 8)
    rng = jax.random.PRNGKey(3)

    tr_full = Trainer(cfg)
    state0 = tr_full.init_state(batch)
    full_state, full_m = tr_full.train_step(state0, batch, rng)

    tr_acc = Trainer(_with_accum(cfg, 4))
    state0b = tr_acc.init_state(batch)  # same seed -> identical init
    acc_state, acc_m = tr_acc.train_step(state0b, batch, rng)

    assert np.isclose(float(full_m["loss"]), float(acc_m["loss"]), rtol=1e-5)
    assert np.isclose(
        float(full_m["grad_norm"]), float(acc_m["grad_norm"]), rtol=1e-4
    )
    _leaf_allclose(full_state.params, acc_state.params)
    _leaf_allclose(full_state.opt_state, acc_state.opt_state, rtol=1e-3, atol=1e-5)


def test_grad_accum_learns():
    cfg = _with_accum(tiny_config(batch_size=4), 2)
    tr = Trainer(cfg)
    batch = make_batch(cfg, 4)
    state = tr.init_state(batch)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(20):
        state, m = tr.train_step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8


def test_grad_accum_non_divisible_raises():
    cfg = _with_accum(tiny_config(batch_size=4), 3)
    tr = Trainer(cfg)
    batch = make_batch(cfg, 4)
    state = tr.init_state(batch)
    with pytest.raises(ValueError, match="grad_accum"):
        tr.train_step(state, batch, jax.random.PRNGKey(0))


def test_grad_accum_composes_with_data_parallel():
    """DP-sharded batch + accumulation == unsharded full-batch step: the
    microbatch reshape happens on the already-sharded batch axis and XLA
    still psums the grads correctly."""
    cfg = _with_accum(tiny_config(batch_size=8), 2)
    tr = Trainer(cfg)
    batch = make_batch(cfg, 8)
    state = tr.init_state(batch)
    rng = jax.random.PRNGKey(5)
    plain_state, plain_m = tr.train_step(state, batch, rng)

    mesh = make_mesh(n_data=4)
    tr2 = Trainer(_with_accum(tiny_config(batch_size=8), 2), mesh=mesh)
    state2 = tr2.init_state(batch)
    sharded = shard_batch(batch, mesh)
    dp_state, dp_m = tr2.train_step(state2, sharded, rng)

    assert np.isclose(float(plain_m["loss"]), float(dp_m["loss"]), rtol=1e-5)
    _leaf_allclose(plain_state.params, dp_state.params)
