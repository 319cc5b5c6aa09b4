"""ZeRO-1 optimizer-state sharding: numerics match replicated execution.

SURVEY.md §2.2's last parallelism row ("shard optimizer state along the
data axis"); the reference replicates optimizer state on every DDP rank
(/root/reference/train.py:183-186)."""

import numpy as np
import jax
import jax.numpy as jnp

from gta_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from gta_tpu.parallel.zero import opt_state_shardings
from gta_tpu.train.trainer import Trainer
from tests.test_trainer import tiny_config, make_batch


def _run_steps(tr, state, batch, n=3):
    rng = jax.random.PRNGKey(7)
    for _ in range(n):
        state, m = tr.train_step(state, batch, rng)
    return state, m


def test_zero1_matches_replicated():
    cfg = tiny_config(batch_size=8)
    batch_host = make_batch(cfg, 8)

    # baseline: fully replicated on a pure-DP mesh
    tr_base = Trainer(cfg)
    mesh = make_mesh(n_data=8, n_model=1)
    state0 = tr_base.init_state(batch_host)
    batch = shard_batch(batch_host, mesh)
    base = state0.replace(
        params=replicate(state0.params, mesh),
        opt_state=replicate(state0.opt_state, mesh),
    )
    base, m_base = _run_steps(tr_base, base, batch)

    # ZeRO-1: moments sharded over data
    tr_zero = Trainer(cfg)
    zstate = tr_zero.init_state(batch_host)
    zstate = tr_zero.enable_zero1(zstate, mesh)

    # the moment tensors actually got partitioned
    shardings = opt_state_shardings(zstate.opt_state, mesh)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any(spec != jax.sharding.PartitionSpec() for spec in specs)

    zstate, m_zero = _run_steps(tr_zero, zstate, batch)
    np.testing.assert_allclose(
        float(m_zero["loss"]), float(m_base["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(base.params), jax.tree.leaves(zstate.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # the updated state kept its layout: moments sharded, params replicated
    mu_leaves = jax.tree.leaves(zstate.opt_state)
    assert any(not x.sharding.is_fully_replicated for x in mu_leaves)
    assert all(x.sharding.is_fully_replicated for x in jax.tree.leaves(zstate.params))


def test_zero1_composes_with_tp():
    cfg = tiny_config(batch_size=4)
    batch_host = make_batch(cfg, 4)

    tr = Trainer(cfg)
    mesh = make_mesh(n_data=2, n_model=4)
    state = tr.init_state(batch_host)
    base_eval = tr.eval_step(state.params, batch_host)

    state = tr.enable_zero1(state, mesh, tp=True)
    batch = shard_batch(batch_host, mesh)
    out = tr.eval_step(state.params, batch)
    np.testing.assert_allclose(
        np.asarray(out["mse"]), np.asarray(base_eval["mse"]), rtol=2e-4
    )
    state, m = _run_steps(tr, state, batch, n=2)
    assert np.isfinite(float(m["loss"]))
    # moments carry both axes somewhere in the tree
    specs = [
        s.spec for s in jax.tree.leaves(opt_state_shardings(state.opt_state, mesh, tp=True))
    ]
    assert any("data" in str(spec) and "model" in str(spec) for spec in specs)
