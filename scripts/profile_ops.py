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


def capture_trace(
    cfg_path: str, steps: int, batch: int, bf16: bool, outdir: str, pregen: bool = False
):
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

    if pregen:
        # isolate the train step: generate every batch before the trace so
        # the profile attributes time to training ops only (~150 MB/batch —
        # keep steps modest)
        batches = [gen.batch(i, batch) for i in range(1, steps + 1)]
        jax.block_until_ready(batches[-1].input_images)
        with jax.profiler.trace(outdir):
            for b in batches:
                state, m = trainer.train_step(state, b, rng)
            float(m["loss"])
        return

    with jax.profiler.trace(outdir):
        for i in range(1, steps + 1):
            state, m = trainer.train_step(state, gen.batch(i, batch), rng)
        float(m["loss"])  # close the chain inside the trace


_OPCODE_RE = None


def _opcode(hlo_text: str) -> str:
    """HLO opcode from an instruction string like
    '%fusion.4 = f32[..]{..} fusion(...), kind=kCustom, calls=...'."""
    global _OPCODE_RE
    import re

    if _OPCODE_RE is None:
        _OPCODE_RE = re.compile(r"=\s*(?:\([^)]*\)|\S+)\s+([a-z][a-z0-9-]*)\(")
    m = _OPCODE_RE.search(hlo_text)
    op = m.group(1) if m else hlo_text.split("(")[0].lstrip("%")
    if op == "fusion":
        km = re.search(r"kind=k(\w+)", hlo_text)
        if km:
            op = f"fusion:{km.group(1)}"
    return op


def summarize(outdir: str, top: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {outdir}"
    per_inst = collections.Counter()
    per_inst_n = collections.Counter()
    per_cat = collections.Counter()
    total_device_ns = 0
    spaces = []
    for p in paths:
        space = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            space.ParseFromString(f.read())
        spaces.append(space)
    # The TPU device plane carries an 'XLA Ops' line with one event per
    # executed HLO instruction (self time). Module/step lines cover the
    # same wall span and would double-count, so only 'XLA Ops' is read.
    # The CPU backend has no device plane — fall back to its host line.
    def is_device(name):
        n = name.lower()
        return "tpu" in n or "gpu" in n or "/device" in n

    have_device = any(
        is_device(pl.name) and any(l.name == "XLA Ops" for l in pl.lines)
        for s in spaces
        for pl in s.planes
    )
    for space in spaces:
        for plane in space.planes:
            if have_device and not is_device(plane.name):
                continue
            if not have_device and plane.name != "/host:CPU":
                continue
            ev_names = plane.event_metadata
            for line in plane.lines:
                if have_device and line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    nm = ev_names[ev.metadata_id].name
                    dur = ev.duration_ps // 1000
                    per_inst[nm] += dur
                    per_inst_n[nm] += 1
                    per_cat[_opcode(nm)] += dur
                    total_device_ns += dur

    def pct(ns):
        return 100.0 * ns / max(total_device_ns, 1)

    print("== by opcode ==")
    print(f"{'opcode':<24}  {'total_ms':>9}  {'%':>5}")
    for nm, ns in per_cat.most_common(top):
        print(f"{nm:<24}  {ns / 1e6:9.3f}  {pct(ns):5.1f}")
    print()
    print("== by instruction ==")
    print(f"{'total_ms':>9}  {'count':>6}  {'%':>5}  instruction")
    for nm, ns in per_inst.most_common(top):
        print(f"{ns / 1e6:9.3f}  {per_inst_n[nm]:6d}  {pct(ns):5.1f}  {nm[:140]}")
    print(
        f"total device op self-time: {total_device_ns / 1e6:.1f} ms "
        f"across {len(paths)} plane file(s)"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="runs/clevrtr/GTA/gta/config.yaml")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-dir", default=None, help="summarize an existing trace")
    ap.add_argument(
        "--pregen", action="store_true",
        help="pre-generate batches outside the trace (train-step ops only)",
    )
    args = ap.parse_args()
    outdir = args.trace_dir or tempfile.mkdtemp(prefix="gta_profile_")
    if args.trace_dir is None:
        capture_trace(args.config, args.steps, args.batch, args.bf16, outdir, args.pregen)
        print(f"trace: {outdir}")
    summarize(outdir, args.top)


if __name__ == "__main__":
    main()
