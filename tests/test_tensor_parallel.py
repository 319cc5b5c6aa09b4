"""Tensor-parallel head sharding: numerics match replicated execution."""

import numpy as np
import jax
import jax.numpy as jnp

from gta_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from gta_tpu.parallel.tp import param_shardings, shard_params
from gta_tpu.train.trainer import Trainer
from tests.test_trainer import tiny_config, make_batch


def test_head_sharded_step_matches_replicated():
    cfg = tiny_config(batch_size=4)
    tr = Trainer(cfg)
    batch = make_batch(cfg, 4)
    state = tr.init_state(batch)

    base_eval = tr.eval_step(state.params, batch)

    mesh = make_mesh(n_data=2, n_model=4)
    assert mesh.devices.shape == (2, 4)

    sharded_params = shard_params(state.params, mesh)
    sharded_batch = shard_batch(batch, mesh)

    # some kernels actually got model-sharded (heads=2 divides 4? heads*dh=64
    # out features divisible by 4 — check at least one non-replicated leaf)
    shardings = param_shardings(state.params, mesh)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any(spec != jax.sharding.PartitionSpec() for spec in specs)

    out = tr.eval_step(sharded_params, sharded_batch)
    np.testing.assert_allclose(
        np.asarray(out["mse"]), np.asarray(base_eval["mse"]), rtol=2e-4
    )

    # a full TP+DP train step runs and stays finite
    state_sh = state.replace(
        params=sharded_params,
        opt_state=jax.tree.map(
            lambda x: jax.device_put(x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())),
            state.opt_state,
        ),
    )
    new_state, m = tr.train_step(state_sh, sharded_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
