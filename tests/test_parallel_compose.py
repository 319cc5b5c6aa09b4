"""Composed-strategy goldens: grad accumulation x (DP x TP x ZeRO-1) and
grad accumulation x ring sequence-parallelism.

Each strategy is individually golden-tested (test_grad_accum.py,
test_tensor_parallel.py, test_zero.py, test_ring.py); these tests pin the
*compositions* the CLI can reach (--accum with --n-model/--zero/--n-seq)
to the plain dense full-batch step. All math is exact (equal microbatches,
exact collectives, exact online-softmax ring recurrence), so agreement is
fp32 reassociation tolerance, not approximation tolerance.

Runs on the 8-virtual-device CPU mesh (conftest).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gta_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from gta_tpu.train.trainer import Trainer
from tests.test_trainer import make_batch, tiny_config


def _with_accum(cfg, accum):
    return dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, grad_accum=accum)
    )


def _dense_step(cfg, batch, key):
    tr = Trainer(cfg)
    s0 = tr.init_state(batch, seed=0)
    params0 = jax.tree.map(np.asarray, s0.params)  # train_step donates s0
    s1, m = tr.train_step(s0, batch, key)
    return params0, s1, m


def test_grad_accum_composes_with_tp_zero1():
    """--accum 2 on a 2x4 data x model mesh with ZeRO-1 moments == the plain
    dense full-batch step (same loss, same updated params)."""
    base_cfg = tiny_config(batch_size=8)
    batch = make_batch(base_cfg, 8)
    key = jax.random.PRNGKey(2)
    params0, dense_s1, dense_m = _dense_step(base_cfg, batch, key)

    mesh = make_mesh(n_data=2, n_model=4)
    tr = Trainer(_with_accum(base_cfg, 2), mesh=mesh)
    st = tr.init_state(batch, seed=0)
    st = st.replace(
        params=replicate(jax.tree.map(jnp.asarray, params0), mesh),
        opt_state=replicate(st.opt_state, mesh),
    )
    st = tr.enable_zero1(st, mesh, tp=True)
    ss, ms = tr.train_step(st, shard_batch(batch, mesh), key)

    np.testing.assert_allclose(float(ms["loss"]), float(dense_m["loss"]), rtol=1e-5)
    for pa, pb in zip(jax.tree.leaves(ss.params), jax.tree.leaves(dense_s1.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=3e-5)

    # the ZeRO layout survived the accumulated step
    assert any(
        not x.sharding.is_fully_replicated for x in jax.tree.leaves(ss.opt_state)
    )


def test_grad_accum_composes_with_ring():
    """--accum 2 + --n-seq 2 ring attention on a 2x2 data x seq mesh == the
    plain dense full-batch step."""
    from gta_tpu.config import with_ring_attention

    base_cfg = tiny_config(batch_size=4)
    batch = make_batch(base_cfg, 4)
    key = jax.random.PRNGKey(7)
    params0, dense_s1, dense_m = _dense_step(base_cfg, batch, key)

    mesh = make_mesh(n_data=2, n_seq=2)
    prev = jax.sharding.get_mesh()
    jax.set_mesh(mesh)
    try:
        tr = Trainer(with_ring_attention(_with_accum(base_cfg, 2)), mesh=mesh)
        st = tr.init_state(batch, seed=0)
        st = st.replace(
            params=replicate(jax.tree.map(jnp.asarray, params0), mesh),
            opt_state=replicate(st.opt_state, mesh),
        )
        ss, ms = tr.train_step(st, shard_batch(batch, mesh), key)
        np.testing.assert_allclose(
            float(ms["loss"]), float(dense_m["loss"]), rtol=1e-5
        )
        for pa, pb in zip(
            jax.tree.leaves(ss.params), jax.tree.leaves(dense_s1.params)
        ):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=3e-5)
    finally:
        jax.set_mesh(prev)
