#!/usr/bin/env python
"""Generate the full experiment-config matrix into runs/.

Reproduces the reference's 28-run experiment grid (runs/{clevrtr,msn}/
{GTA,otherPEs}/*) in our schema-compatible YAML. Run once; outputs are
committed. Every config is validated by parsing it with load_config.
"""

import copy
import os
import sys

import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gta_args(f_dims, so2=None, so3=None, **extra):
    args = {"max_freq_h": 1, "max_freq_w": 1, "f_dims": f_dims}
    if so2 is not None:
        args["so2"] = so2
    if so3 is not None:
        args["so3"] = so3
    args.update(extra)
    return {"method": {"name": "gta", "args": args}}


def clevr_base():
    return {
        "data": {
            "dataset": "clevrtr",
            "path": None,
            "num_points": 2560,
            "kwargs": {
                "downsample": 1,
                "downsample_input_coord": 3,
                "return_transform": True,
                "num_input_views": 2,
                "num_target_views": 3,
                "overlap": False,
            },
        },
        "model": {
            "model_type": "tsrt",
            "args": {
                "encoder": "isrt",
                "decoder": "isrt",
                "encoder_kwargs": {
                    "pos_start_octave": -5,
                    "dim": 768,
                    "attdim": 384,
                    "heads": 6,
                    "dropout": 0.01,
                    "emb": False,
                    "attn_args": gta_args({"se3": 32, "so2": 32}, so2=8),
                },
                "decoder_kwargs": {
                    "z_dim": 384,
                    "rmlp_dim": 768,
                    "heads": 6,
                    "pos_start_octave": -5,
                    "dropout": 0.01,
                    "emb": "const",
                    "attn_args": gta_args({"se3": 32, "so2": 32}, so2=8),
                },
            },
        },
        "training": {
            "mixed_prec": False,
            "num_workers": 4,
            "batch_size": 32,
            "model_selection_metric": "psnr",
            "model_selection_mode": "maximize",
            "print_every": 100,
            "visualize_every": 10000,
            "validate_every": 10000,
            "checkpoint_every": 1000,
            "backup_every": 25000,
            "max_it": 2000000,
            "decay_it": 1000000,
            "lr_warmup": 5000,
        },
    }


def msn_base():
    cfg = clevr_base()
    cfg["data"]["dataset"] = "msn"
    cfg["data"]["kwargs"].update(
        {"downsample": 0, "num_input_views": 5, "num_target_views": 5}
    )
    del cfg["data"]["kwargs"]["overlap"]
    enc = cfg["model"]["args"]["encoder_kwargs"]
    dec = cfg["model"]["args"]["decoder_kwargs"]
    for k in ("dim", "attdim"):
        enc.pop(k, None)
    enc["heads"] = 8
    dec.update({"z_dim": 768, "heads": 8})
    dec.pop("rmlp_dim")
    msn_attn = gta_args({"triv": 0, "se3": 48, "so2": 24, "so3": 24}, so2=6, so3=2)
    enc["attn_args"] = copy.deepcopy(msn_attn)
    dec["attn_args"] = copy.deepcopy(msn_attn)
    cfg["training"].update(
        {
            "mixed_prec": True,
            "num_workers": 1,
            "batch_size": 64,
            "max_it": 4000000,
            "decay_it": 2000000,
            "lr_warmup": 10000,
        }
    )
    return cfg


def set_attn(cfg, enc_attn, dec_attn=None):
    cfg["model"]["args"]["encoder_kwargs"]["attn_args"] = copy.deepcopy(enc_attn)
    cfg["model"]["args"]["decoder_kwargs"]["attn_args"] = copy.deepcopy(
        dec_attn if dec_attn is not None else enc_attn
    )
    return cfg


def build_all():
    runs = {}

    # ----- CLEVR-TR / GTA -------------------------------------------------
    runs["clevrtr/GTA/gta"] = clevr_base()

    c = clevr_base()
    c["data"]["kwargs"]["camera_noise"] = 0.1
    runs["clevrtr/GTA/gta_cnoise0.1"] = c

    c = clevr_base()
    set_attn(c, gta_args({"triv": 2, "se3": 30, "so2": 32}, so2=8, euclid_sim=True))
    c["training"]["backup_every"] = 500000
    runs["clevrtr/GTA/gta_euclid"] = c

    c = clevr_base()
    set_attn(
        c,
        gta_args({"se3": 64}),
        gta_args({"se3": 32, "so2": 32}, so2=8, recompute_so2=True),
    )
    runs["clevrtr/GTA/gta_no2demb"] = c

    c = clevr_base()
    set_attn(
        c,
        gta_args({"so2": 64}, so2=16),
        gta_args({"se3": 32, "so2": 32}, so2=8, recompute_so2=True),
    )
    runs["clevrtr/GTA/gta_no3demb"] = c

    c = clevr_base()
    set_attn(c, gta_args({"se3": 32, "so2": 32}, so2=8, v_transform=False))
    c["training"]["num_workers"] = 1
    runs["clevrtr/GTA/gta_novtrnsfm"] = c

    c = clevr_base()
    a = gta_args({"se3": 32, "so2": 32}, so2=8, shared_freqs=True)
    a["method"]["args"].update({"max_freq_h": 0.5, "max_freq_w": 0.5})
    set_attn(c, a)
    c["training"]["num_workers"] = 1
    runs["clevrtr/GTA/gta_sharedfreqs"] = c

    c = clevr_base()
    set_attn(c, gta_args({"se3": 32, "so3": 16, "so2": 16}, so2=4, so3=2))
    c["training"]["num_workers"] = 1
    runs["clevrtr/GTA/gta_so3"] = c

    c = clevr_base()
    set_attn(c, gta_args({"triv": 2, "se3": 32, "t2": 30}))
    c["training"].update({"num_workers": 1, "max_it": 3000000})
    runs["clevrtr/GTA/gta_t2"] = c

    # ----- CLEVR-TR / other PEs ------------------------------------------
    def plain(name, args=None):
        return {"method": {"name": name, "args": args or {}}}

    c = clevr_base()
    set_attn(c, {**plain("ape"), "softmax": "adjustable"})
    c["model"]["args"]["decoder_kwargs"].update({"scale_h": 240, "scale_w": 320})
    c["training"]["num_workers"] = 1
    runs["clevrtr/otherPEs/ape"] = c

    c = clevr_base()
    set_attn(c, gta_args({"se3": 32, "so2": 32}, so2=8, elementwise_mul=True))
    runs["clevrtr/otherPEs/elementwise_mul"] = c

    c = clevr_base()
    c["data"]["kwargs"]["image_coord"] = True
    set_attn(c, plain("frustum_posemb", {"D": 30, "dmax": 20}))
    c["model"]["args"]["decoder_kwargs"]["emb"] = None
    runs["clevrtr/otherPEs/frustum_posemb_dmax20"] = c

    c = clevr_base()
    c["model"]["args"]["ftl"] = True
    set_attn(
        c,
        {**gta_args({"so2": 64}, so2=16, v_transform=False), "softmax": "adjustable"},
        gta_args({"so2": 64}, so2=16, v_transform=False),
    )
    c["training"].update({"visualize_every": 3000000, "validate_every": 3000000})
    runs["clevrtr/otherPEs/ftl_rope"] = c

    c = clevr_base()
    c["data"]["kwargs"] = {
        "downsample": 1,
        "num_input_views": 2,
        "num_target_views": 3,
        "overlap": False,
        "kubric_basis": True,
        "avoid_zerocamorg": True,
    }
    c["model"]["model_type"] = "srt"
    set_attn(c, plain("gbt"))
    c["model"]["args"]["decoder_kwargs"]["emb"] = "ray"
    runs["clevrtr/otherPEs/gbt"] = c

    c = clevr_base()
    set_attn(c, {**plain("mln"), "softmax": "adjustable"})
    c["model"]["args"]["decoder_kwargs"].update({"scale_h": 240, "scale_w": 320})
    runs["clevrtr/otherPEs/mln"] = c

    def repast_cfg(base, noise=None, kubric_basis=True):
        c = base
        c["data"]["kwargs"] = {
            k: v
            for k, v in c["data"]["kwargs"].items()
            if k not in ("downsample_input_coord", "return_transform")
        }
        if kubric_basis:
            c["data"]["kwargs"]["kubric_basis"] = True
        if noise:
            c["data"]["kwargs"]["camera_noise"] = noise
        c["model"]["model_type"] = "srt"
        set_attn(
            c,
            plain("repast", {"q_emb_dim": 180, "k_emb_dim": 180}),
            plain("repast", {"q_emb_dim": 0, "k_emb_dim": 180}),
        )
        c["model"]["args"]["decoder_kwargs"].pop("emb")
        return c

    runs["clevrtr/otherPEs/repast"] = repast_cfg(clevr_base())
    runs["clevrtr/otherPEs/repast_cnoise0.1"] = repast_cfg(clevr_base(), noise=0.1)

    c = clevr_base()
    set_attn(
        c,
        plain(
            "invatt_directsum",
            {"rpe": True, "so2": 4, "max_freq_h": 1, "max_freq_w": 1,
             "f_dims": {"triv": 64, "se3": 16, "so2": 32}},
        ),
    )
    c["training"]["max_it"] = 3000000
    runs["clevrtr/otherPEs/rpe"] = c

    c = clevr_base()
    c["data"]["kwargs"] = {
        "downsample": 1,
        "num_input_views": 2,
        "num_target_views": 3,
        "overlap": False,
        "kubric_basis": True,
        "canonical_view": True,
    }
    c["model"]["model_type"] = "srt"
    c["model"]["args"]["encoder_kwargs"]["emb"] = "ray"
    c["model"]["args"]["decoder_kwargs"]["emb"] = "ray"
    set_attn(c, plain(""))
    runs["clevrtr/otherPEs/srt"] = c

    # ----- MSN / GTA ------------------------------------------------------
    runs["msn/GTA/gta_so3"] = msn_base()

    m = msn_base()
    set_attn(m, gta_args({"se3": 48, "so2": 48}, so2=12))
    runs["msn/GTA/gta"] = m

    m = msn_base()
    set_attn(
        m,
        gta_args({"se3": 96}),
        gta_args({"se3": 48, "so2": 48}, so2=12, recompute_so2=True),
    )
    runs["msn/GTA/gta_no2demb"] = m

    m = msn_base()
    set_attn(
        m,
        gta_args({"so2": 96}, so2=24),
        gta_args({"se3": 48, "so2": 48}, so2=12, recompute_so2=True),
    )
    runs["msn/GTA/gta_no3demb"] = m

    m = msn_base()
    set_attn(m, gta_args({"se3": 48, "so2": 48}, so2=12, v_transform=False))
    runs["msn/GTA/gta_novtrnsfm"] = m

    m = msn_base()
    a = gta_args({"se3": 48, "so2": 48}, so2=12, shared_freqs=True)
    a["method"]["args"].update({"max_freq_h": 0.5, "max_freq_w": 0.5})
    set_attn(m, a)
    runs["msn/GTA/gta_sharedfreqs"] = m

    m = msn_base()
    set_attn(
        m,
        gta_args(
            {"triv": 0, "se3": 48, "so2": 24, "so3": 24}, so2=6, so3=2, euclid_sim=True
        ),
    )
    m["training"]["backup_every"] = 500000
    runs["msn/GTA/gta_so3_euclid"] = m

    m = msn_base()
    set_attn(m, gta_args({"se3": 48, "t2": 48}))
    runs["msn/GTA/gta_t2"] = m

    # ----- MSN / other PEs ------------------------------------------------
    # (reference msn repast has no kubric_basis kwarg)
    runs["msn/otherPEs/repast"] = repast_cfg(msn_base(), kubric_basis=False)

    m = msn_base()
    m["data"]["kwargs"] = {
        k: v
        for k, v in m["data"]["kwargs"].items()
        if k not in ("downsample_input_coord", "return_transform")
    }
    m["model"]["model_type"] = "srt"
    m["model"]["args"]["encoder_kwargs"].update({"heads": 12, "emb": "ray"})
    m["model"]["args"]["decoder_kwargs"].update({"heads": 12, "emb": "ray"})
    set_attn(m, plain(""))
    runs["msn/otherPEs/srt"] = m

    return runs


def main():
    sys.path.insert(0, ROOT)
    from gta_tpu.config import config_from_dict

    runs = build_all()
    for name, cfg in runs.items():
        # validate by parsing into typed config
        config_from_dict(cfg)
        path = os.path.join(ROOT, "runs", name, "config.yaml")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(f"# generated by scripts/gen_run_configs.py — run {name}\n")
            yaml.safe_dump(cfg, f, sort_keys=False)
    print(f"wrote {len(runs)} configs")


if __name__ == "__main__":
    main()
