#!/usr/bin/env python
"""Training entry point (reference train.py CLI surface, TPU-native runtime).

Usage: python train.py <config.yaml> <datapath> [flags]

Single-controller JAX: one process per host; devices on this host form (or
join) the data-parallel mesh. Multi-host runs call
jax.distributed.initialize() when the standard cluster env vars are set.
"""

import argparse
import dataclasses
import datetime
import json
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Train a NVS model (TPU-native GTA)")
    parser.add_argument("config", type=str, help="Path to config file")
    parser.add_argument("datapath", type=str, nargs="?", default=None, help="Dataset dir")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--outdir", type=str, default=None)
    parser.add_argument("--exit-after", type=int, default=None)
    parser.add_argument("--test", action="store_true", help="eval on test split")
    parser.add_argument("--evalnow", action="store_true")
    parser.add_argument("--visnow", action="store_true")
    parser.add_argument("--max-eval", type=int, default=None)
    parser.add_argument("--full-scale", action="store_true")
    parser.add_argument("--print-model", action="store_true")
    parser.add_argument("--synthetic", action="store_true", help="use synthetic scenes")
    parser.add_argument(
        "--device-data",
        action="store_true",
        help=(
            "generate synthetic scenes *on device* (data/device_synth.py): "
            "zero per-step host->device transfer — the right mode whenever "
            "device ingest bandwidth is the bottleneck (e.g. tunneled TPU)"
        ),
    )
    parser.add_argument("--batch-size", type=int, default=None, help="override global batch size")
    parser.add_argument(
        "--speed_test",
        type=int,
        default=0,
        help=(
            "time 100 train iters (batch divided by this value) -> time.npy. "
            "Times the steps *chained* between two host syncs (per-iter "
            "block_until_ready lies over tunneled devices); time.npy holds "
            "the mean per-step milliseconds."
        ),
    )
    parser.add_argument(
        "--n-model",
        type=int,
        default=1,
        help=(
            "tensor-parallel mesh width: shard attention heads / FFN over a "
            "`model` axis of this size (devices = n_data x n_model)"
        ),
    )
    parser.add_argument(
        "--n-seq",
        type=int,
        default=1,
        help=(
            "sequence-parallel mesh width: ring GTA attention over a `seq` "
            "axis of this size — encoder tokens view-sharded, decoder "
            "input-view KV ring-passed over ICI (devices = n_data x n_seq "
            "x n_model; input view count must divide by n_seq)"
        ),
    )
    parser.add_argument(
        "--zero",
        action="store_true",
        help=(
            "ZeRO-1: shard optimizer state over the data axis (params stay "
            "replicated / TP-sharded); composes with --n-model"
        ),
    )
    parser.add_argument(
        "--profile",
        type=int,
        default=0,
        help="capture a jax.profiler trace of this many steps into <outdir>/trace",
    )
    parser.add_argument("--wandb", action="store_true", help="log to Weights & Biases")
    parser.add_argument(
        "--rtpt",
        type=str,
        default=None,
        help="set process title via rtpt with these initials (reference train.py:98-101)",
    )
    parser.add_argument(
        "--debug-nans", action="store_true", help="enable jax_debug_nans checks"
    )
    parser.add_argument(
        "--bf16",
        action="store_true",
        help="force training.mixed_prec (bf16 compute policy) regardless of config",
    )
    parser.add_argument(
        "--validate-every",
        type=int,
        default=None,
        help="override training.validate_every (eval cadence in steps)",
    )
    parser.add_argument(
        "--accum",
        type=int,
        default=None,
        help="gradient accumulation: scan this many equal microbatches per "
        "optimizer step inside the jit — peak activation memory scales with "
        "batch_size/accum, so one chip can train at any global batch "
        "(the reference only reaches large batches by adding GPUs)",
    )
    args = parser.parse_args()

    if not os.path.exists(args.config):
        parser.error(f"config file not found: {args.config}")

    # multi-host rendezvous (no-op single host)
    import jax

    from gta_tpu.runtime import setup as _setup_cache

    _setup_cache()

    if "COORDINATOR_ADDRESS" in os.environ or int(os.environ.get("NUM_PROCESSES", "1")) > 1:
        jax.distributed.initialize()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    import jax.numpy as jnp
    from gta_tpu.config import load_config
    from gta_tpu.data.loader import Loader
    from gta_tpu.data.registry import get_dataset
    from gta_tpu.parallel.mesh import make_mesh, shard_batch, replicate
    from gta_tpu.train.checkpoint import Checkpointer
    from gta_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    if args.datapath:
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, path=args.datapath))
    if args.synthetic or (cfg.data.dataset != "synthetic" and not cfg.data.path):
        print("No datapath given — falling back to synthetic scenes.")
        h, w = cfg.data.height, cfg.data.width
        ds = cfg.data.downsample
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(
                cfg.data,
                dataset="synthetic",
                height=h // (2**ds) if ds else h,
                width=w // (2**ds) if ds else w,
                downsample=0,
            ),
        )
    if args.seed is not None:
        cfg = dataclasses.replace(cfg, seed=args.seed)
    max_it = args.exit_after if args.exit_after is not None else cfg.training.max_it

    is_main = jax.process_index() == 0
    out_dir = args.outdir or os.path.dirname(args.config)
    if args.seed is not None:
        out_dir = os.path.join(out_dir, f"seed{args.seed}")
    os.makedirs(out_dir, exist_ok=True)

    if args.batch_size is not None:
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, batch_size=args.batch_size)
        )
    if args.bf16:
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, mixed_prec=True)
        )
    if args.validate_every is not None:
        cfg = dataclasses.replace(
            cfg,
            training=dataclasses.replace(cfg.training, validate_every=args.validate_every),
        )
    if args.accum is not None:
        if args.accum < 1:
            parser.error(f"--accum must be >= 1, got {args.accum}")
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, grad_accum=args.accum)
        )
    t_cfg = cfg.training
    global_batch = t_cfg.batch_size
    if args.speed_test:
        global_batch = max(1, global_batch // args.speed_test)
    n_hosts = jax.process_count()
    host_batch = global_batch // n_hosts

    sel_sign = 1 if t_cfg.model_selection_mode == "maximize" else -1
    sel_metric = t_cfg.model_selection_metric

    eval_split = "test" if args.test else "val"
    use_device_data = args.device_data and cfg.data.dataset == "synthetic"
    if use_device_data:
        from gta_tpu.data.device_synth import DeviceSynthetic

        print("Loading training set (synthetic, on-device generation)...")
        dev_train = DeviceSynthetic(cfg.data, "train", seed=cfg.seed)
        dev_val = DeviceSynthetic(
            cfg.data, eval_split, seed=cfg.seed, full_scale=args.full_scale
        )
        train_ds = eval_ds = None
        val_batches = dev_val.val_batches(args.max_eval or 256, max(1, host_batch // 8))
        steps_per_epoch = 10000 // global_batch or 1
    else:
        print(f"Loading training set ({cfg.data.dataset})...")
        train_ds = get_dataset("train", cfg.data, seed=cfg.seed)
        eval_ds = get_dataset(
            eval_split, cfg.data, full_scale=args.full_scale, max_len=args.max_eval
        )

        train_loader = Loader(
            train_ds,
            host_batch,
            shuffle=True,
            seed=cfg.seed,
            num_workers=t_cfg.num_workers,
            shard_index=jax.process_index(),
            shard_count=n_hosts,
        )
        val_loader = Loader(
            eval_ds,
            max(1, host_batch // 8),
            shuffle=False,
            num_workers=t_cfg.num_workers,
            shard_index=jax.process_index(),
            shard_count=n_hosts,
        )
    vis_n = min(6, host_batch) or 1
    if eval_ds is not None and hasattr(eval_ds, "__len__"):
        # --max-eval can truncate the eval split below the vis batch size;
        # an oversized vis batch + drop_last loader would yield no batch.
        vis_n = max(1, min(vis_n, len(eval_ds)))
    data_vis = None

    mesh = make_mesh(n_model=args.n_model, n_seq=args.n_seq)
    if args.n_seq > 1 or args.n_model > 1:
        # make the mesh ambient: the in-model shard_maps (sequence-parallel
        # ring, parallel/ring.py; head-sharded fused kernel under TP,
        # parallel/tp.py) read the `seq`/`model` axes from any jit.
        jax.set_mesh(mesh)
    if args.n_seq > 1:
        from gta_tpu.config import with_ring_attention

        cfg = with_ring_attention(cfg)
    trainer = Trainer(cfg, mesh=mesh)
    ckpt = Checkpointer(out_dir)

    # init from one batch
    init_batch = (
        dev_train.batch(0, host_batch, jax.process_index(), n_hosts)
        if use_device_data
        else next(iter(train_loader))
    )
    state = trainer.init_state(init_batch, seed=cfg.seed)
    counts = trainer.param_counts(state)
    print(
        f"Number of parameters: encoder {counts['encoder']:,}, "
        f"decoder {counts['decoder']:,}, total {counts['total']:,}"
    )
    if args.print_model:
        import jax.tree_util as jtu

        for path, leaf in jtu.tree_leaves_with_path(state.params):
            print(jtu.keystr(path), leaf.shape)

    # auto-resume
    restored, scalars = ckpt.try_restore_latest(state, max_it)
    if restored is not None:
        state = restored
        print(f"Resumed from checkpoint at it={int(state.step)}")
    epoch_it = scalars.get("epoch_it", -1)
    time_elapsed = scalars.get("t", 0.0)
    metric_val_best = scalars.get("loss_val_best", -sel_sign * np.inf)
    run_id = scalars.get("run_id") or None

    if args.zero:
        # ZeRO-1: optimizer moments shard over `data` (parallel/zero.py);
        # params stay replicated or, with --n-model, TP-sharded.
        state = trainer.enable_zero1(state, mesh, tp=args.n_model > 1)
    elif args.n_model > 1:
        # TP: attention-head/FFN kernels shard over `model`; the opt state's
        # mu/nu subtrees carry params-shaped leaf paths, so the same
        # path-based rules apply (parallel/tp.py).
        from gta_tpu.parallel.tp import shard_params

        state = state.replace(
            params=shard_params(state.params, mesh),
            opt_state=shard_params(state.opt_state, mesh),
        )
    else:
        state = state.replace(
            params=replicate(state.params, mesh),
            opt_state=replicate(state.opt_state, mesh),
        )
    rng = jax.random.PRNGKey(cfg.seed)

    # Stream-position resume for iterable datasets (reference
    # multishapenet.py:316-320): skip the items this host already consumed
    # in the current epoch so resume does not replay from scene 0.
    if restored is not None and train_ds is not None and hasattr(train_ds, "skip"):
        consumed = (int(state.step) - max(epoch_it, 0) * len(train_loader)) * host_batch
        if consumed > 0:
            train_ds.skip(consumed)
            print(f"Skipping {consumed} already-consumed stream items.")

    # Preemption-safe save: on SIGTERM/SIGINT finish the current step, write
    # the rolling checkpoint, then exit (the reference only supports
    # restart-based recovery from its periodic saves, train.py:221-235).
    import signal

    stop_requested = {"flag": False}

    def _on_signal(signum, frame):
        print(f"Signal {signum} received — checkpointing before exit.")
        stop_requested["flag"] = True

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    rtpt = None
    if args.rtpt is not None:
        try:
            from rtpt import RTPT

            rtpt = RTPT(
                name_initials=args.rtpt,
                experiment_name=os.path.basename(out_dir) or "gta-tpu",
                max_iterations=max_it,
            )
            rtpt.start()
        except Exception as e:
            print(f"rtpt unavailable ({e}); continuing without")

    wandb_run = None
    if args.wandb and is_main:
        # persisted run_id => resume attaches to the same wandb run
        # (reference train.py:240-252)
        try:
            import wandb

            if run_id is None:
                run_id = wandb.util.generate_id()
                print(f"Sampled new wandb run_id {run_id}.")
            else:
                print(f"Resuming wandb with existing run_id {run_id}.")
            wandb_run = wandb.init(
                project="gta-tpu", name=out_dir, id=run_id, resume="allow"
            )
        except Exception as e:
            print(f"wandb unavailable ({e}); continuing without")

    it = int(state.step) - 1
    speed_times = []
    profile_stop_at = None
    evalnow, visnow = args.evalnow, args.visnow

    # In-tree metrics record (loss curve + eval PSNR/SSIM curve) so quality
    # evidence survives the run without wandb — appended, resume-safe.
    metrics_path = os.path.join(out_dir, "metrics.jsonl")

    def log_metrics(kind, payload):
        if not is_main:
            return
        with open(metrics_path, "a") as f:
            f.write(json.dumps({"kind": kind, "it": it, "t": time_elapsed, **payload}) + "\n")

    # Honest wall-clock: over an async/tunneled device, per-step dispatch
    # timing undercounts massively (steps enqueue in ~ms and complete much
    # later). `t` is resumed checkpoint time + real elapsed session time.
    t_resumed = time_elapsed
    session_start = time.perf_counter()

    def _now():
        return t_resumed + time.perf_counter() - session_start

    def train_epoch():
        """One epoch of batches: host loader, or on-device generation keyed
        by the step counter (resume-exact: ids derive from `it`)."""
        if not use_device_data:
            train_loader.set_epoch(epoch_it)
            yield from train_loader
            return
        for _ in range(steps_per_epoch):
            yield dev_train.batch(it + 1, host_batch, jax.process_index(), n_hosts)

    while True:
        epoch_it += 1
        for batch in train_epoch():
            it += 1
            time_elapsed = _now()
            batch = shard_batch(batch, mesh)

            scalars_out = {
                "epoch_it": epoch_it,
                "it": it,
                "t": time_elapsed,
                "loss_val_best": float(metric_val_best),
            }
            if run_id is not None:
                scalars_out["run_id"] = run_id
            if t_cfg.checkpoint_every > 0 and it % t_cfg.checkpoint_every == 0 and it > 0:
                ckpt.save("latest", state, scalars_out)
                print("Checkpoint saved.")
            if t_cfg.backup_every > 0 and it % t_cfg.backup_every == 0 and it > 0:
                ckpt.save(f"step_{it}", state, scalars_out)
                print("Backup checkpoint saved.")

            if visnow or (it > 0 and t_cfg.visualize_every > 0 and it % t_cfg.visualize_every == 0):
                if is_main:
                    if data_vis is None:
                        data_vis = (
                            dev_val.batch(0, vis_n)
                            if use_device_data
                            else next(iter(Loader(eval_ds, vis_n, shuffle=True, num_workers=2)))
                        )
                    print("Visualizing...")
                    trainer.visualize(
                        state.params, data_vis,
                        os.path.join(out_dir, "renders-val"), mesh=mesh,
                    )
                visnow = False

            if evalnow or (it > 0 and t_cfg.validate_every > 0 and it % t_cfg.validate_every == 0):
                print("Evaluating...")
                eval_dict = trainer.evaluate(
                    state.params,
                    iter(val_batches) if use_device_data else iter(val_loader),
                    mesh=mesh,
                )
                print("Evaluation results:", eval_dict)
                log_metrics("eval", eval_dict)
                if wandb_run is not None:
                    wandb_run.log(eval_dict, step=it)
                metric_val = eval_dict[sel_metric]
                if sel_sign * (metric_val - metric_val_best) > 0:
                    metric_val_best = metric_val
                    print(f"New best model ({sel_metric} {metric_val_best:.6f})")
                    scalars_out["loss_val_best"] = float(metric_val_best)
                    ckpt.save("best", state, scalars_out)
                evalnow = False

            if args.profile and profile_stop_at is None:
                jax.profiler.start_trace(os.path.join(out_dir, "trace"))
                profile_stop_at = it + args.profile

            state, metrics = trainer.train_step(state, batch, rng)
            if args.profile:
                jax.block_until_ready(metrics["loss"])

            if profile_stop_at is not None and it >= profile_stop_at:
                jax.profiler.stop_trace()
                print(f"Profiler trace written to {out_dir}/trace")
                profile_stop_at = 1 << 60

            if args.speed_test:
                # Chained protocol (bench.py): steps stay enqueued back to
                # back; a host fetch of the loss closes each timing window.
                # Per-iter block_until_ready can return before device
                # completion over tunneled devices, so per-iter walltimes lie.
                speed_times.append(time.perf_counter())
                if len(speed_times) == 1 or len(speed_times) == 101:
                    float(metrics["loss"])  # hard sync at window edges
                    speed_times[-1] = time.perf_counter()
                if len(speed_times) == 101:
                    mean_ms = (speed_times[-1] - speed_times[0]) / 100 * 1e3
                    print(f"chained mean step time: {mean_ms:.2f} ms")
                    np.save(os.path.join(out_dir, "time.npy"), np.asarray([mean_ms]))
                    return

            if t_cfg.print_every > 0 and it % t_cfg.print_every == 0:
                if rtpt is not None:
                    rtpt.step()
                loss = float(metrics["loss"])
                lr = float(metrics["lr"])
                elapsed = str(datetime.timedelta(seconds=int(time_elapsed)))
                print(
                    f"{out_dir} t={elapsed} [Epoch {epoch_it:02d}] it={it}, "
                    f"loss={loss:.4f} lr={lr:.3e}"
                )
                log_metrics("train", {"loss": loss, "lr": lr})
                if wandb_run is not None:
                    wandb_run.log({"loss": loss, "lr": lr, "t": time_elapsed}, step=it)

            if stop_requested["flag"]:
                ckpt.save("latest", state, scalars_out)
                print("Preemption checkpoint saved. Exiting.")
                return

            if it >= max_it:
                print("Iteration limit reached. Exiting.")
                ckpt.save("latest", state, scalars_out)
                return


if __name__ == "__main__":
    main()
