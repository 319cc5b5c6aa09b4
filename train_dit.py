#!/usr/bin/env python
"""Training entry point for the DiT-2DGTA family (class-conditional image
diffusion; the "ImageNet DiT generation with 2D GTA" target family).

Usage: python train_dit.py <config.yaml> [datapath] [flags]

Without a datapath (no ImageNet in the environment) training falls back to
the hermetic procedural image dataset — the full pipeline (loss, EMA-free
AdamW, checkpoints, CFG sampling grids) is identical either way.
"""

import argparse
import dataclasses
import json
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Train DiT-2DGTA")
    parser.add_argument("config", type=str)
    parser.add_argument("datapath", type=str, nargs="?", default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--outdir", type=str, default=None)
    parser.add_argument("--exit-after", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--max-eval", type=int, default=64)
    parser.add_argument("--samplenow", action="store_true")
    parser.add_argument(
        "--device-data",
        action="store_true",
        help="generate procedural images on device (zero per-step H2D)",
    )
    parser.add_argument("--sample-steps", type=int, default=50)
    parser.add_argument("--guidance", type=float, default=4.0)
    args = parser.parse_args()

    if not os.path.exists(args.config):
        parser.error(f"config file not found: {args.config}")

    import jax

    from gta_tpu.runtime import setup as _setup_cache

    _setup_cache()

    from gta_tpu.data.images import SyntheticImages, collate_images
    from gta_tpu.data.loader import Loader
    from gta_tpu.parallel.mesh import make_mesh, replicate
    from gta_tpu.train.checkpoint import Checkpointer
    from gta_tpu.train.dit_trainer import DiTTrainer, load_dit_config

    cfg = load_dit_config(args.config)
    if args.seed is not None:
        cfg = dataclasses.replace(cfg, seed=args.seed)
    if args.batch_size is not None:
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, batch_size=args.batch_size)
        )
    t_cfg = cfg.training
    max_it = args.exit_after if args.exit_after is not None else t_cfg.max_it

    out_dir = args.outdir or os.path.dirname(args.config)
    os.makedirs(out_dir, exist_ok=True)
    is_main = jax.process_index() == 0
    host_batch = t_cfg.batch_size // jax.process_count()

    mcfg = cfg.model
    use_device_data = args.device_data and not (args.datapath or cfg.data.path)
    if use_device_data:
        from gta_tpu.data.images import DeviceSyntheticImages

        print("Procedural images, on-device generation.")
        dev_train = DeviceSyntheticImages(
            mcfg.input_size, mcfg.num_classes, "train", cfg.data.num_images, cfg.seed
        )
        dev_val = DeviceSyntheticImages(
            mcfg.input_size, mcfg.num_classes, "val", args.max_eval, cfg.seed
        )
        train_ds = val_ds = None
        val_batches = dev_val.val_batches(args.max_eval, max(1, host_batch // 4))
    elif cfg.data.dataset == "imagenet" and (args.datapath or cfg.data.path):
        from gta_tpu.data.images import ImageNetTFDS

        train_ds = ImageNetTFDS(mcfg.input_size, "train", args.datapath or cfg.data.path)
        val_ds = ImageNetTFDS(mcfg.input_size, "val", args.datapath or cfg.data.path)
    else:
        if cfg.data.dataset == "imagenet":
            print("No ImageNet datapath — falling back to procedural images.")
        train_ds = SyntheticImages(
            mcfg.input_size, mcfg.num_classes, "train", cfg.data.num_images, cfg.seed
        )
        val_ds = SyntheticImages(
            mcfg.input_size, mcfg.num_classes, "val", args.max_eval, cfg.seed
        )

    if not use_device_data:
        loader_kw = dict(
            num_workers=t_cfg.num_workers,
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
            collate_fn=collate_images,
        )
        train_loader = Loader(train_ds, host_batch, shuffle=True, seed=cfg.seed, **loader_kw)
        val_loader = Loader(val_ds, max(1, host_batch // 4), shuffle=False, **loader_kw)

    mesh = make_mesh()
    trainer = DiTTrainer(cfg, mesh=mesh)
    ckpt = Checkpointer(out_dir)

    init_batch = (
        dev_train.batch(0, host_batch, jax.process_index(), jax.process_count())
        if use_device_data
        else next(iter(train_loader))
    )
    state = trainer.init_state(init_batch, seed=cfg.seed)
    print(f"DiT parameters: {trainer.param_count(state):,}")

    restored, scalars = ckpt.try_restore_latest(state, max_it)
    if restored is not None:
        state = restored
        print(f"Resumed from checkpoint at it={int(state.step)}")
    state = state.replace(
        params=replicate(state.params, mesh), opt_state=replicate(state.opt_state, mesh)
    )
    rng = jax.random.PRNGKey(cfg.seed)

    metrics_path = os.path.join(out_dir, "metrics.jsonl")

    def log_metrics(kind, payload, it):
        if is_main:
            with open(metrics_path, "a") as f:
                f.write(json.dumps({"kind": kind, "it": it, **payload}) + "\n")

    def sample_grid(it):
        from gta_tpu.utils.visualize import draw_visualization_grid

        n = min(8, mcfg.num_classes)
        labels = np.arange(n) % mcfg.num_classes
        imgs = trainer.sample(
            state.params, labels, jax.random.PRNGKey(it),
            steps=args.sample_steps, guidance=args.guidance,
        )
        cols = [(f"class {int(l)}", (imgs[i : i + 1] + 1.0) / 2.0) for i, l in enumerate(labels)]
        draw_visualization_grid(cols, os.path.join(out_dir, f"samples_{it}"))
        print(f"Sample grid written: samples_{it}.png")

    it = int(state.step) - 1
    epoch = -1
    samplenow = args.samplenow
    from gta_tpu.parallel.mesh import shard_batch as _shard

    def train_epoch():
        if not use_device_data:
            train_loader.set_epoch(epoch)
            yield from train_loader
            return
        for _ in range(max(1, cfg.data.num_images // t_cfg.batch_size)):
            yield dev_train.batch(it + 1, host_batch, jax.process_index(), jax.process_count())

    while True:
        epoch += 1
        for batch in train_epoch():
            it += 1
            if not use_device_data:
                batch = {k: np.asarray(v) for k, v in batch.items()}
            scalars_out = {"it": it}
            if t_cfg.checkpoint_every > 0 and it > 0 and it % t_cfg.checkpoint_every == 0:
                ckpt.save("latest", state, scalars_out)
            if t_cfg.backup_every > 0 and it > 0 and it % t_cfg.backup_every == 0:
                ckpt.save(f"step_{it}", state, scalars_out)
            if samplenow or (
                t_cfg.visualize_every > 0 and it > 0 and it % t_cfg.visualize_every == 0
            ):
                if is_main:
                    sample_grid(it)
                samplenow = False
            if t_cfg.validate_every > 0 and it > 0 and it % t_cfg.validate_every == 0:
                eval_dict = trainer.evaluate(
                    state.params,
                    iter(val_batches) if use_device_data else iter(val_loader),
                    seed=cfg.seed,
                )
                print(f"it={it} eval:", eval_dict)
                log_metrics("eval", eval_dict, it)

            sharded = {
                k: jax.device_put(v, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
                for k, v in batch.items()
            }
            state, metrics = trainer.train_step(state, sharded, rng)

            if t_cfg.print_every > 0 and it % t_cfg.print_every == 0:
                loss = float(metrics["loss"])
                print(f"{out_dir} it={it} loss={loss:.4f} mse={float(metrics['mse']):.4f}")
                log_metrics("train", {"loss": loss, "mse": float(metrics["mse"])}, it)

            if it >= max_it:
                ckpt.save("latest", state, {"it": it})
                print("Iteration limit reached. Exiting.")
                return


if __name__ == "__main__":
    main()
