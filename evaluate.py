#!/usr/bin/env python
"""Standalone evaluation: PSNR / SSIM / (optional) LPIPS on full-scale frames.

Protocol mirrors reference evaluate.py:81-145: batch-1 full-scale test
split, encode each scene once, decode every target view's full frame,
score per view. Resolutions: 240x320 (clevrtr) / 128x128 (msn). LPIPS
(VGG+Alex) requires pretrained weights and is skipped with a notice when
unavailable (zero-egress environments).

Usage: python evaluate.py <config.yaml> <datapath> <ckpt_name> [--max-scenes N]
"""

import argparse
import dataclasses
import json

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("datapath", type=str, nargs="?", default=None)
    parser.add_argument("--ckpt", type=str, default="best", help="latest | best | step_N")
    parser.add_argument("--outdir", type=str, default=None)
    parser.add_argument("--max-scenes", type=int, default=None)
    parser.add_argument("--synthetic", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from gta_tpu.runtime import setup as _setup_cache

    _setup_cache()

    from gta_tpu.config import load_config
    from gta_tpu.data.registry import get_dataset
    from gta_tpu.data.synthetic import collate
    from gta_tpu.models.context import SceneBatch
    from gta_tpu.train.checkpoint import Checkpointer
    from gta_tpu.train.trainer import Trainer
    from gta_tpu.utils.metrics import ssim as ssim_fn

    import os

    cfg = load_config(args.config)
    if args.datapath:
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, path=args.datapath))
    if args.synthetic or (cfg.data.dataset != "synthetic" and not cfg.data.path):
        print("No datapath — evaluating on synthetic scenes.")
        # Keep the native height/width AND `downsample`: SyntheticScenes
        # renders inputs at the downsampled training resolution but
        # full-scale targets at native resolution, matching the reference
        # protocol (evaluate.py:61,90-91 — e.g. CLEVR-TR scores 240x320
        # frames from a model trained on 120x160 inputs). Training runs
        # (train.py --synthetic / --device-data) instead rewrite the config
        # to the downsampled dims, which this mirrors for the inputs.
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, dataset="synthetic")
        )

    out_dir = args.outdir or os.path.dirname(args.config)
    trainer = Trainer(cfg)
    dataset = get_dataset("test", cfg.data, full_scale=True, max_len=args.max_scenes)

    # Full-scale targets come at the dataset's native resolution (CLEVR-TR:
    # 240x320 regardless of `downsample`, which only shrinks the inputs —
    # the reference scores full frames, evaluate.py:91). Prefer the
    # dataset's own h/w; fall back to the config dims (MSN-style datasets
    # without input downsampling).
    H = getattr(dataset, "target_h", None) or getattr(dataset, "h", cfg.data.height)
    W = getattr(dataset, "target_w", None) or getattr(dataset, "w", cfg.data.width)

    item0 = dataset[0] if hasattr(dataset, "__getitem__") else next(iter(dataset))
    batch0 = jax.tree.map(jnp.asarray, collate([item0]))
    state = trainer.init_state(batch0)
    ckpt = Checkpointer(out_dir)
    if ckpt.exists(args.ckpt):
        state, _ = ckpt.restore(args.ckpt, state)
        print(f"Loaded checkpoint {args.ckpt}")
    else:
        print(f"WARNING: checkpoint '{args.ckpt}' not found in {out_dir}/ckpts — "
              "evaluating random init")

    lpips_vgg = lpips_alex = None
    try:
        # pure-JAX LPIPS: weights exported via scripts/export_lpips_weights.py
        # and pointed to by LPIPS_WEIGHTS (utils/lpips_jax.py)
        from gta_tpu.utils.lpips_jax import LPIPSJax

        lpips_vgg = LPIPSJax()
        print("Using JAX LPIPS (VGG) with exported weights.")
    except Exception:
        try:
            from gta_tpu.utils.metrics import LPIPS

            lpips_vgg, lpips_alex = LPIPS("vgg"), LPIPS("alex")
        except Exception as e:
            print(f"LPIPS unavailable ({e}); reporting PSNR/SSIM/MSE only")

    n = len(dataset) if args.max_scenes is None else min(args.max_scenes, len(dataset))
    psnrs, ssims, mses, lp_v, lp_a = [], [], [], [], []
    items = (dataset[i] for i in range(n)) if hasattr(dataset, "__getitem__") else iter(dataset)
    for i, item in enumerate(items):
        if i >= n:
            break
        batch = jax.tree.map(jnp.asarray, collate([item]))
        transform_mode = batch.target_transforms is not None
        if transform_mode:
            Nt = batch.target_transforms.shape[1]
        else:
            # non-transform items are flat [1, Nt*H*W, 3] in view order
            Nt = batch.target_rays.shape[1] // (H * W)
        for v in range(Nt):
            if transform_mode:
                pred = trainer.render_image(
                    state.params,
                    batch,
                    H,
                    W,
                    target_transform=np.asarray(batch.target_transforms[:, v]),
                    chunk=16384,
                    # full-scale items carry the native-resolution canonical
                    # grid (inputs may be downsampled to a smaller grid)
                    rays=np.asarray(batch.target_rays[:, v]),
                    cam=np.asarray(batch.target_camera_pos[:, v]),
                )  # [1, H, W, 3]
                gt = np.asarray(batch.target_pixels[:, v]).reshape(1, H, W, 3)
            else:
                sl = slice(v * H * W, (v + 1) * H * W)
                pred = trainer.render_rays(
                    state.params,
                    batch,
                    np.asarray(batch.target_rays[:, sl]),
                    np.asarray(batch.target_camera_pos[:, sl]),
                    chunk=16384,
                ).reshape(1, H, W, 3)
                gt = np.asarray(batch.target_pixels[:, sl]).reshape(1, H, W, 3)
            mse = float(np.mean((pred - gt) ** 2))
            mses.append(mse)
            psnrs.append(-10.0 * np.log10(mse))
            ssims.append(float(ssim_fn(jnp.asarray(pred), jnp.asarray(gt))))
            if lpips_vgg is not None:
                lp_v.append(lpips_vgg(pred, gt))
            if lpips_alex is not None:
                lp_a.append(lpips_alex(pred, gt))
        if (i + 1) % 10 == 0:
            print(f"scene {i + 1}/{n}: psnr={np.mean(psnrs):.3f} ssim={np.mean(ssims):.4f}")

    results = {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "mse": float(np.mean(mses)),
        "n_scenes": n,
    }
    if lp_v:
        results["lpips_vgg"] = float(np.mean(lp_v))
    if lp_a:
        results["lpips_alex"] = float(np.mean(lp_a))
    print(json.dumps(results))
    with open(os.path.join(out_dir, "eval_results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
