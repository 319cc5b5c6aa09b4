"""All generated run configs parse; checkpoint save/restore round-trips."""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gta_tpu.config import load_config


RUN_CONFIGS = sorted(glob.glob("/root/repo/runs/*/*/*/config.yaml"))


def test_all_run_configs_parse():
    assert len(RUN_CONFIGS) >= 29
    for path in RUN_CONFIGS:
        cfg = load_config(path)
        enc_attn = cfg.model.encoder.attn
        if enc_attn.is_gta:
            assert enc_attn.gta.f_dims.total > 0


def test_reference_configs_also_parse():
    ref = sorted(glob.glob("/root/reference/runs/*/*/*/config.yaml"))
    assert len(ref) == 29
    for path in ref:
        load_config(path)


def test_generated_configs_match_reference_semantics():
    """Each generated run config parses to the *same typed Config* as its
    reference counterpart (modulo the environment-specific dataset path) —
    the experiment matrix is semantically identical, not just parseable."""
    import dataclasses

    ref = sorted(glob.glob("/root/reference/runs/*/*/*/config.yaml"))
    for r in ref:
        mine = r.replace("/root/reference/", "/root/repo/")
        assert os.path.exists(mine), f"missing generated config for {r}"
        a, b = load_config(r), load_config(mine)
        a = dataclasses.replace(a, data=dataclasses.replace(a.data, path=""))
        b = dataclasses.replace(b, data=dataclasses.replace(b.data, path=""))
        assert a == b, f"semantic drift vs reference: {mine}"


def test_checkpoint_roundtrip(tmp_path):
    from gta_tpu.train.checkpoint import Checkpointer
    from tests.test_trainer import tiny_config, make_batch
    from gta_tpu.train.trainer import Trainer

    cfg = tiny_config()
    tr = Trainer(cfg)
    batch = make_batch(cfg, 2)
    state = tr.init_state(batch)
    state, _ = tr.train_step(state, batch, jax.random.PRNGKey(0))

    ckpt = Checkpointer(str(tmp_path))
    ckpt.save("latest", state, {"it": 1, "loss_val_best": 12.5})

    state0 = tr.init_state(batch)
    restored, scalars = ckpt.try_restore_latest(state0)
    assert scalars["it"] == 1 and scalars["loss_val_best"] == 12.5
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)
    # training continues from the restored state
    restored, m = tr.train_step(restored, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
