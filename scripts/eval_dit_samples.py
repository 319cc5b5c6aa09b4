"""Quantitative sample metric for the DiT-2DGTA family.

Samples N class-conditional images per class from a trained DiT checkpoint
and scores them with the training-free spectral classifier
(utils/stripe_classifier.py): the procedural classes are oriented stripes
whose orientation/frequency are exact functions of the label, so
"class-conditional sample accuracy" measures whether the model actually
learned p(x|y) — a number, not a loss curve. Also reports per-class eval
loss on held-out labeled images.

The reference claims the DiT+2DGTA capability (README.md:29-32) but ships
no branch, so there is no protocol to match; this defines one that is
reproducible from the dataset definition alone.

Usage:
  python -m scripts.eval_dit_samples runs/imagenet/DiT/dit_gta/config.yaml \
      --outdir <ckpt-dir> [--per-class 24] [--steps 50] [--guidance 4.0]
"""

import argparse
import json
import os

import numpy as np

from gta_tpu.runtime import setup as _setup_cache

_setup_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--outdir", required=True, help="run dir holding ckpts/")
    ap.add_argument("--ckpt", default="latest")
    ap.add_argument("--per-class", type=int, default=24)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance", type=float, default=4.0)
    ap.add_argument("--max-eval", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from gta_tpu.data.images import SyntheticImages, collate_images
    from gta_tpu.train.checkpoint import Checkpointer
    from gta_tpu.train.dit_trainer import DiTTrainer, load_dit_config
    from gta_tpu.utils.stripe_classifier import accuracy

    cfg = load_dit_config(args.config)
    mcfg = cfg.model
    trainer = DiTTrainer(cfg)

    ds = SyntheticImages(mcfg.input_size, mcfg.num_classes, "test", args.max_eval)
    init_batch = collate_images([ds[i] for i in range(2)])
    state = trainer.init_state(init_batch, seed=cfg.seed)
    ckpt = Checkpointer(args.outdir)
    if not ckpt.exists(args.ckpt):
        raise SystemExit(f"checkpoint '{args.ckpt}' not found under {args.outdir}/ckpts")
    state, _ = ckpt.restore(args.ckpt, state)
    it = int(state.step)
    print(f"Loaded {args.ckpt} at it={it}")

    # class-conditional samples, scored by the spectral classifier
    K, n = mcfg.num_classes, args.per_class
    labels = np.repeat(np.arange(K), n)
    imgs = []
    chunk = max(K, 64 // max(1, n) * n)  # keep sample batches modest
    for i in range(0, len(labels), chunk):
        imgs.append(
            trainer.sample(
                state.params,
                labels[i : i + chunk],
                jax.random.PRNGKey(args.seed + i),
                steps=args.steps,
                guidance=args.guidance,
            )
        )
    imgs = np.concatenate(imgs, 0)
    acc, per = accuracy(imgs, labels, K)

    # per-class eval loss on held-out labeled images
    items = [ds[i] for i in range(args.max_eval)]
    ev = collate_images(items)
    losses = np.full(K, np.nan)
    for k in range(K):
        sel = ev["label"] == k
        if not sel.any():
            continue
        m = trainer.evaluate(
            state.params,
            [{"image": ev["image"][sel], "label": ev["label"][sel]}],
            seed=args.seed,
        )
        losses[k] = float(m["loss"])

    result = {
        "config": args.config,
        "it": it,
        "per_class_n": n,
        "sample_class_accuracy": round(acc, 4),
        "per_class_accuracy": [round(float(x), 4) for x in per],
        "per_class_eval_loss": [round(float(x), 5) for x in losses],
        "eval_loss_mean": round(float(np.nanmean(losses)), 5),
        "steps": args.steps,
        "guidance": args.guidance,
    }
    print(json.dumps(result))
    out_path = os.path.join(args.outdir, "dit_sample_eval.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"written: {out_path}")


if __name__ == "__main__":
    main()
