"""Golden cross-framework parity: gta_tpu vs the ACTUAL reference PyTorch
implementation (/root/reference), weights transplanted, identical batches.

This is the strongest parity evidence obtainable without the datasets:
instead of oracle-vs-kernel self-consistency, every tested config builds
the reference `SRT`/`TransformingSRT` (models_nvs.py:14-91) on CPU torch,
copies its freshly-initialized weights into our flax model, feeds both the
same synthetic SceneBatch, and asserts forward pixels and the training MSE
agree to fp32 tolerance.

Reference call path matched: trainer.py:85-125 (extras construction +
forward + loss), encoder.py:268-345, decoder.py:355-384,
utils/gta.py:92-279.

so3 configs are INCLUDED — the reference's missing J_dense.pt is
regenerated from our Wigner implementation (scripts/
gen_jdense_for_reference.py), and the fixed real-SH basis difference
between the frameworks is absorbed into the weight transplant
(ref_parity_utils.so3_qkv_sign_fns).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
import yaml

from gta_tpu.config import config_from_dict
from gta_tpu.data.synthetic import SyntheticScenes, collate
from gta_tpu.models.srt import build_model

from tests.ref_parity_utils import (
    REFERENCE_DIR,
    batch_to_ref_inputs,
    load_reference,
    so3_sign_map,
    transplant,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference checkout not present"
)


@pytest.fixture(scope="session")
def ref(tmp_path_factory):
    pytest.importorskip("torch")
    return load_reference(str(tmp_path_factory.mktemp("refparity")))


# (run-dir, forward-pixel tolerance) — tolerances are fp32 noise budgets:
# 5 pre-LN transformer blocks + sigmoid keep everything O(1), so 1e-4 is
# ~100x the observed drift; euclid/so3 paths get a little more slack for
# their extra trig/matmul chains.
CONFIGS = [
    ("runs/clevrtr/GTA/gta", 1e-4),
    ("runs/clevrtr/GTA/gta_cnoise0.1", 1e-4),
    ("runs/clevrtr/GTA/gta_t2", 1e-4),
    ("runs/clevrtr/GTA/gta_euclid", 2e-4),
    ("runs/clevrtr/GTA/gta_novtrnsfm", 1e-4),
    ("runs/clevrtr/GTA/gta_sharedfreqs", 1e-4),
    ("runs/clevrtr/GTA/gta_no2demb", 1e-4),
    ("runs/clevrtr/GTA/gta_no3demb", 1e-4),
    ("runs/clevrtr/GTA/gta_so3", 2e-4),
    ("runs/clevrtr/otherPEs/srt", 1e-4),
    ("runs/clevrtr/otherPEs/ape", 1e-4),
    ("runs/clevrtr/otherPEs/mln", 1e-4),
    ("runs/clevrtr/otherPEs/gbt", 1e-4),
    ("runs/clevrtr/otherPEs/rpe", 1e-4),
    ("runs/clevrtr/otherPEs/repast", 1e-4),
    ("runs/clevrtr/otherPEs/repast_cnoise0.1", 1e-4),
    ("runs/clevrtr/otherPEs/elementwise_mul", 1e-4),
    ("runs/clevrtr/otherPEs/frustum_posemb_dmax20", 1e-4),
    ("runs/clevrtr/otherPEs/ftl_rope", 1e-4),
    ("runs/msn/GTA/gta", 2e-4),
    ("runs/msn/GTA/gta_t2", 2e-4),
    ("runs/msn/GTA/gta_no2demb", 2e-4),
    ("runs/msn/GTA/gta_no3demb", 2e-4),
    ("runs/msn/GTA/gta_novtrnsfm", 2e-4),
    ("runs/msn/GTA/gta_sharedfreqs", 2e-4),
    ("runs/msn/GTA/gta_so3", 2e-4),
    ("runs/msn/GTA/gta_so3_euclid", 2e-4),
    ("runs/msn/otherPEs/srt", 1e-4),
    ("runs/msn/otherPEs/repast", 1e-4),
]


# the canonical shape-shrink recipe lives with the importer so the tests
# exercise the same template the migration tool builds against
from gta_tpu.utils.ref_import import shrink_data as _small_data  # noqa: E402


def _make_batch(cfg, n=2):
    ds = SyntheticScenes(cfg.data, "train", num_scenes=n)
    return collate([ds[i] for i in range(n)])


def _build_pair(run, ref):
    torch = ref["torch"]
    with open(os.path.join(run, "config.yaml")) as f:
        raw = yaml.safe_load(f)

    cfg = config_from_dict(raw)
    cfg = dataclasses.replace(cfg, data=_small_data(cfg.data))
    model = build_model(cfg.model)
    batch_np = _make_batch(cfg)
    batch = jax.tree.map(jnp.asarray, batch_np)
    params = model.init(jax.random.PRNGKey(0), batch, True)

    torch.manual_seed(0)
    args = raw["model"]["args"]
    if raw["model"]["model_type"] == "tsrt":
        ref_model = ref["models_nvs"].TransformingSRT(args)
    else:
        ref_model = ref["models_nvs"].SRT(args)
    ref_model.eval()
    return cfg, model, params, batch_np, batch, ref_model


@pytest.mark.slow
@pytest.mark.parametrize("run,tol", CONFIGS, ids=[c[0].split("runs/")[1] for c in CONFIGS])
def test_forward_parity(run, tol, ref):
    torch = ref["torch"]
    cfg, model, params, batch_np, batch, ref_model = _build_pair(run, ref)

    params = transplant(
        ref_model.state_dict(), params, so3_sign=so3_sign_map(cfg, params)
    )

    pred, _ = model.apply(params, batch, True)
    pred = np.asarray(pred, dtype=np.float64)  # [B, Nt*P, 3]

    fargs, extras = batch_to_ref_inputs(batch_np)
    with torch.no_grad():
        ref_pred, _ = ref_model(*fargs, extras=extras)
    ref_pred = ref_pred.detach().cpu().numpy().astype(np.float64)
    ref_pred = ref_pred.reshape(pred.shape)

    diff = np.abs(pred - ref_pred)
    report = os.environ.get("PARITY_REPORT")
    if report:
        import json

        with open(report, "a") as f:
            f.write(
                json.dumps(
                    {"run": run, "max_abs": float(diff.max()), "mean_abs": float(diff.mean())}
                )
                + "\n"
            )
    assert diff.max() <= tol, (
        f"{run}: forward pixels diverge, max|Δ|={diff.max():.3e} "
        f"mean|Δ|={diff.mean():.3e}"
    )

    # training-loss agreement (trainer.py:119-121: MSE over views+points)
    tgt = np.asarray(batch_np.target_pixels, dtype=np.float64).reshape(pred.shape)
    loss_mine = ((pred - tgt) ** 2).mean()
    loss_ref = ((ref_pred - tgt) ** 2).mean()
    assert abs(loss_mine - loss_ref) <= tol


GRAD_CONFIGS = [
    "runs/clevrtr/GTA/gta",
    "runs/clevrtr/GTA/gta_so3",
    "runs/clevrtr/otherPEs/mln",
]


@pytest.mark.slow
@pytest.mark.parametrize("run", GRAD_CONFIGS, ids=[c.split("runs/")[1] for c in GRAD_CONFIGS])
def test_gradient_parity(run, ref):
    """Backward-pass equivalence: d(MSE)/d(params) matches the reference
    per-parameter after the same weight-space transforms (transpose, conv
    permute, so3 basis signs — gradients live in the same basis as the
    weights). One step of SGD from transplanted init therefore yields the
    same model in both frameworks."""
    torch = ref["torch"]
    cfg, model, params, batch_np, batch, ref_model = _build_pair(run, ref)
    sign_map = so3_sign_map(cfg, params)
    params = transplant(ref_model.state_dict(), params, so3_sign=sign_map)

    tgt = np.asarray(batch_np.target_pixels, dtype=np.float32)
    tgt_flat = tgt.reshape(tgt.shape[0], -1, 3)

    def loss_fn(p):
        pred, _ = model.apply(p, batch, True)
        return jnp.mean((pred.astype(jnp.float32) - jnp.asarray(tgt_flat)) ** 2)

    g_mine = jax.grad(loss_fn)(params)

    fargs, extras = batch_to_ref_inputs(batch_np)
    ref_model.zero_grad()
    pred, _ = ref_model(*fargs, extras=extras)
    loss = ((pred.reshape(tgt_flat.shape) - torch.from_numpy(tgt_flat)) ** 2).mean()
    loss.backward()

    grads = {
        k: p.grad for k, p in ref_model.named_parameters() if p.grad is not None
    }
    g_ref = transplant(grads, params, so3_sign=sign_map)

    flat_mine = jax.tree_util.tree_flatten_with_path(g_mine)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(g_ref)[0])
    checked = 0
    for path, gm in flat_mine:
        gr = np.asarray(flat_ref[path])
        gm = np.asarray(gm)
        scale = max(np.abs(gr).max(), 1e-8)
        np.testing.assert_allclose(
            gm, gr, atol=max(2e-6, 2e-4 * scale), rtol=2e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
        checked += 1
    assert checked > 20
