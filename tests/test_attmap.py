"""Attention-map (segmentation) output path: decoder returns per-ray maps."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gta_tpu.config import AttnConfig, DecoderConfig, EncoderConfig, ModelConfig
from gta_tpu.data.synthetic import SyntheticScenes, collate
from gta_tpu.models.srt import build_model
from tests.test_models import tiny_data_cfg

PLAIN = AttnConfig(method="")


def test_decoder_attmap_as_segmentation():
    """heads=1 + return_last_attmap yields [B, Tq, Tk] maps summing to 1
    (reference decoder.py:181,375-378: attmap doubles as a soft seg mask)."""
    cfg = ModelConfig(
        model_type="tsrt",
        encoder=EncoderConfig(
            dim=128, attdim=64, heads=2, num_att_blocks=1, emb="ray", attn=PLAIN
        ),
        decoder=DecoderConfig(
            dim=48,
            z_dim=64,
            heads=1,  # asserted by the reference for seg maps
            rmlp_dim=64,
            num_att_blocks=1,
            emb="ray",
            attn=PLAIN,
            return_last_attmap=True,
        ),
    )
    data_cfg = tiny_data_cfg()
    ds = SyntheticScenes(data_cfg, "train", num_scenes=2)
    batch = jax.tree.map(jnp.asarray, collate([ds[0], ds[1]]))

    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    pixels, aux = model.apply(params, batch, deterministic=True)

    assert "masks" in aux
    masks = np.asarray(aux["masks"])  # [B, Tq, Tk]
    assert masks.shape[0] == 2 and masks.shape[1] == pixels.shape[1]
    np.testing.assert_allclose(masks.sum(-1), 1.0, atol=1e-4)
    assert (masks >= 0).all()
