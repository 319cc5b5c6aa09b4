"""Model forward smoke tests across attention methods and reference configs."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gta_tpu.config import (
    AttnConfig,
    Config,
    DataConfig,
    DecoderConfig,
    EncoderConfig,
    FDims,
    GTAArgs,
    ModelConfig,
    load_config,
)
from gta_tpu.data.synthetic import SyntheticScenes, collate
from gta_tpu.models.srt import build_model


def tiny_data_cfg(**kw):
    return DataConfig(
        dataset="synthetic",
        num_points=96,
        height=32,
        width=32,
        downsample=0,
        downsample_input_coord=3,
        num_input_views=2,
        num_target_views=2,
        num_views=5,
        **kw,
    )


def tiny_model_cfg(attn: AttnConfig, heads=2, attdim=64, z_dim=64, dec_dim=48, ftl=False):
    return ModelConfig(
        model_type="tsrt",
        encoder=EncoderConfig(
            dim=128, attdim=attdim, heads=heads, num_att_blocks=2, emb=None, attn=attn
        ),
        decoder=DecoderConfig(
            dim=dec_dim, z_dim=z_dim, heads=heads, rmlp_dim=64, num_att_blocks=1,
            emb="const", attn=attn, scale_h=32, scale_w=32,
        ),
        ftl=ftl,
    )


def make_batch(data_cfg, batch_size=2):
    ds = SyntheticScenes(data_cfg, "train", num_scenes=8)
    return jax.tree.map(jnp.asarray, collate([ds[i] for i in range(batch_size)]))


GTA_ATTN = AttnConfig(
    method="gta",
    gta=GTAArgs(f_dims=FDims(se3=16, so2=16), so2=4),
)


def _forward(model_cfg, batch):
    model = build_model(model_cfg)
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    pixels, aux = model.apply(params, batch, deterministic=True)
    return pixels, params


class TestForward:
    def test_gta(self):
        batch = make_batch(tiny_data_cfg())
        pixels, params = _forward(tiny_model_cfg(GTA_ATTN), batch)
        assert pixels.shape == (2, 96, 3)
        assert np.isfinite(np.asarray(pixels)).all()
        assert (np.asarray(pixels) >= 0).all() and (np.asarray(pixels) <= 1).all()

    def test_gta_so3(self):
        attn = AttnConfig(
            method="gta",
            gta=GTAArgs(f_dims=FDims(se3=16, so2=8, so3=8), so2=2, so3=2),
        )
        batch = make_batch(tiny_data_cfg())
        pixels, _ = _forward(tiny_model_cfg(attn), batch)
        assert np.isfinite(np.asarray(pixels)).all()

    def test_gta_rope_variant(self):
        attn = AttnConfig(
            method="gta",
            gta=GTAArgs(f_dims=FDims(se3=16, so2=16), so2=4, v_transform=False),
        )
        batch = make_batch(tiny_data_cfg())
        pixels, _ = _forward(tiny_model_cfg(attn), batch)
        assert np.isfinite(np.asarray(pixels)).all()

    def test_gta_elementwise_mul(self):
        attn = AttnConfig(
            method="gta",
            gta=GTAArgs(f_dims=FDims(se3=16, so2=16), so2=4, elementwise_mul=True),
        )
        batch = make_batch(tiny_data_cfg())
        pixels, _ = _forward(tiny_model_cfg(attn), batch)
        assert np.isfinite(np.asarray(pixels)).all()

    def test_gta_euclid(self):
        attn = AttnConfig(
            method="gta",
            gta=GTAArgs(f_dims=FDims(se3=18, so2=16), so2=4, euclid_sim=True),
        )
        batch = make_batch(tiny_data_cfg())
        pixels, _ = _forward(tiny_model_cfg(attn, attdim=68, z_dim=68), batch)
        assert np.isfinite(np.asarray(pixels)).all()

    def test_plain_srt(self):
        attn = AttnConfig(method="")
        batch = make_batch(tiny_data_cfg())
        cfg = tiny_model_cfg(attn)
        cfg = dataclasses.replace(
            cfg,
            encoder=dataclasses.replace(cfg.encoder, emb="ray"),
            decoder=dataclasses.replace(cfg.decoder, emb="ray"),
        )
        pixels, _ = _forward(cfg, batch)
        assert np.isfinite(np.asarray(pixels)).all()

    def test_ape(self):
        attn = AttnConfig(method="ape")
        batch = make_batch(tiny_data_cfg())
        pixels, _ = _forward(tiny_model_cfg(attn), batch)
        assert np.isfinite(np.asarray(pixels)).all()

    def test_mln(self):
        attn = AttnConfig(method="mln")
        batch = make_batch(tiny_data_cfg())
        pixels, _ = _forward(tiny_model_cfg(attn), batch)
        assert np.isfinite(np.asarray(pixels)).all()

    def test_gbt(self):
        attn = AttnConfig(method="gbt")
        batch = make_batch(tiny_data_cfg())
        cfg = tiny_model_cfg(attn)
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder, emb="ray")
        )
        pixels, _ = _forward(cfg, batch)
        assert np.isfinite(np.asarray(pixels)).all()

    def test_rpe(self):
        attn = AttnConfig(method="invatt_directsum", rpe=True, rpe_so2=4)
        batch = make_batch(tiny_data_cfg())
        cfg = tiny_model_cfg(attn)
        cfg = dataclasses.replace(
            cfg,
            encoder=dataclasses.replace(cfg.encoder, emb="ray"),
            decoder=dataclasses.replace(cfg.decoder, emb="ray"),
        )
        pixels, _ = _forward(cfg, batch)
        assert np.isfinite(np.asarray(pixels)).all()

    def test_repast(self):
        attn = AttnConfig(method="repast", q_emb_dim=180, k_emb_dim=180)
        batch = make_batch(tiny_data_cfg())
        cfg = tiny_model_cfg(attn)
        cfg = dataclasses.replace(
            cfg,
            encoder=dataclasses.replace(cfg.encoder, emb="ray"),
            decoder=dataclasses.replace(cfg.decoder, emb="ray"),
        )
        pixels, _ = _forward(cfg, batch)
        assert np.isfinite(np.asarray(pixels)).all()

    def test_frustum(self):
        attn = AttnConfig(method="frustum_posemb", frustum_D=4)
        batch = make_batch(tiny_data_cfg())
        pixels, _ = _forward(tiny_model_cfg(attn), batch)
        assert np.isfinite(np.asarray(pixels)).all()

    def test_ftl(self):
        attn = AttnConfig(
            method="gta", gta=GTAArgs(f_dims=FDims(so2=32), so2=8)
        )
        batch = make_batch(tiny_data_cfg())
        cfg = tiny_model_cfg(attn, ftl=True)
        pixels, _ = _forward(cfg, batch)
        assert np.isfinite(np.asarray(pixels)).all()


class TestReferenceConfigs:
    """The reference's run configs must parse and build (tiny batch forward)."""

    @pytest.mark.parametrize(
        "path",
        [
            "/root/reference/runs/clevrtr/GTA/gta/config.yaml",
            "/root/reference/runs/msn/GTA/gta_so3/config.yaml",
        ],
    )
    def test_reference_yaml_forward(self, path):
        cfg = load_config(path)
        # shrink data for test speed but keep model at full config size
        data_cfg = dataclasses.replace(
            cfg.data,
            dataset="synthetic",
            num_points=30,
            height=64,
            width=64,
            downsample=0,
        )
        batch = make_batch(data_cfg, batch_size=1)
        model = build_model(cfg.model)
        params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
        pixels, _ = model.apply(params, batch, deterministic=True)
        assert np.isfinite(np.asarray(pixels)).all()
