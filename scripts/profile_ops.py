"""Per-op profile of the flagship train step: top ops by device self-time.

Captures a jax.profiler trace of N chained train steps (device-generated
data, so the trace is pure compute) and aggregates the device plane's op
events from the xplane proto (parsed with TF's bundled xplane_pb2 — no
tensorboard plugin needed). This answers "where do the milliseconds go"
(docs/TODO.md profiling item): op name, total/self time, occurrence count.

Usage: python -m scripts.profile_ops [--steps 20] [--batch 32] [--bf16]
       [--top 25] [--config runs/clevrtr/GTA/gta/config.yaml]
"""

import argparse
import collections
import dataclasses
import glob
import os
import tempfile

from gta_tpu.runtime import setup as _setup_cache

_setup_cache()

import jax
import jax.numpy as jnp


def capture_trace(cfg_path: str, steps: int, batch: int, bf16: bool, outdir: str):
    from gta_tpu.config import load_config
    from gta_tpu.data.device_synth import DeviceSynthetic
    from gta_tpu.train.trainer import Trainer

    cfg = load_config(cfg_path)
    ds = cfg.data.downsample
    data = dataclasses.replace(
        cfg.data,
        dataset="synthetic",
        height=cfg.data.height // (2**ds) if ds else cfg.data.height,
        width=cfg.data.width // (2**ds) if ds else cfg.data.width,
        downsample=0,
    )
    training = dataclasses.replace(cfg.training, mixed_prec=bf16, batch_size=batch)
    cfg = dataclasses.replace(cfg, data=data, training=training)

    gen = DeviceSynthetic(cfg.data, "train", seed=0)
    trainer = Trainer(cfg)
    b0 = gen.batch(0, batch)
    state = trainer.init_state(b0)
    rng = jax.random.PRNGKey(0)

    # warm up compile + one step outside the trace
    state, m = trainer.train_step(state, b0, rng)
    float(m["loss"])

    with jax.profiler.trace(outdir):
        for i in range(1, steps + 1):
            state, m = trainer.train_step(state, gen.batch(i, batch), rng)
        float(m["loss"])  # close the chain inside the trace


def summarize(outdir: str, top: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {outdir}"
    per_op = collections.Counter()
    per_op_n = collections.Counter()
    total_device_ns = 0
    spaces = []
    for p in paths:
        space = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            space.ParseFromString(f.read())
        spaces.append(space)
    # device planes: TPU ('/device:TPU:0' / 'TPU:0 (pid ..)'); the CPU
    # backend has no device plane — fall back to its '/host:CPU' XLA plane
    def is_device(name):
        n = name.lower()
        return "tpu" in n or "gpu" in n or "/device" in n

    have_device = any(is_device(pl.name) for s in spaces for pl in s.planes)
    for space in spaces:
        for plane in space.planes:
            if have_device:
                if not is_device(plane.name):
                    continue
            elif plane.name != "/host:CPU":
                continue
            ev_names = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    nm = ev_names[ev.metadata_id].name
                    dur = ev.duration_ps // 1000
                    per_op[nm] += dur
                    per_op_n[nm] += 1
                    total_device_ns += dur
    rows = per_op.most_common(top)
    width = max((len(n) for n, _ in rows), default=10)
    print(f"{'op':<{width}}  {'total_ms':>9}  {'count':>6}  {'%':>5}")
    for nm, ns in rows:
        print(
            f"{nm:<{width}}  {ns / 1e6:9.3f}  {per_op_n[nm]:6d}  "
            f"{100.0 * ns / max(total_device_ns, 1):5.1f}"
        )
    print(f"total device event time: {total_device_ns / 1e6:.1f} ms across {len(paths)} plane file(s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="runs/clevrtr/GTA/gta/config.yaml")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-dir", default=None, help="summarize an existing trace")
    args = ap.parse_args()
    outdir = args.trace_dir or tempfile.mkdtemp(prefix="gta_profile_")
    if args.trace_dir is None:
        capture_trace(args.config, args.steps, args.batch, args.bf16, outdir)
        print(f"trace: {outdir}")
    summarize(outdir, args.top)


if __name__ == "__main__":
    main()
