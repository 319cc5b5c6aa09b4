"""Benchmark: GTA training-step throughput in target rays/second.

Default (the driver's headline): the full-size CLEVR-TR GTA model
(runs/clevrtr/GTA/gta/config.yaml: attdim 384, 6 heads, 5+2 attention
blocks, f_dims {se3:32, so2:32}) on synthetic scenes at CLEVR-TR shapes
(2 input views of 120x160, 2560 target rays, global batch 32), fused jit
train step on the local accelerator — the protocol analogue of the
reference's --speed_test harness (reference train.py:66,350-368), reported
as rays/s instead of ms/iter.

--config selects other model families at their training shapes:
  clevrtr  fp32 batch 32, 2x120x160 inputs, 2560 rays   (headline)
  msn_so3  bf16 batch 64, 5x128x128 inputs, 2560 rays, Wigner-D so3:2
  re10k    bf16 batch 32, 2x120x160 inputs, 2048 rays

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

vs_baseline divides by an *estimated* PyTorch A100 reference throughput:
the reference repo publishes no speed numbers (BASELINE.md), so we anchor
on ~10 train iters/s for per-GPU batch 8 x 2560 rays = ~205k rays/s — an
optimistic A100 estimate; the >=3x target from BASELINE.md corresponds to
vs_baseline >= 3. The anchor was estimated for CLEVR shapes, so the other
configs report vs_baseline: null rather than inherit its error bars.
"""

import argparse
import dataclasses
import json
import os
import re
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

from gta_tpu.runtime import setup as _setup_cache

_setup_cache()
import numpy as np

from gta_tpu.config import load_config
from gta_tpu.data.synthetic import SyntheticScenes, collate
from gta_tpu.train.trainer import Trainer

ESTIMATED_A100_RAYS_PER_SEC = 205_000.0
# Measured sustained bf16 matmul peak on THIS chip (v5e behind the tunnel):
# chained 8192^3 matmuls between host fetches, see docs/TODO.md. Using the
# measured number rather than the 197 TFLOP/s datasheet peak makes `mfu`
# a statement about this deployment, independent of the A100 anchor.
MEASURED_BF16_PEAK_FLOPS = 159e12
WARMUP = 3
ITERS = 20
REPEATS = 3

# config key -> (yaml, synthetic data overrides, default batch, metric name,
#                has_baseline_anchor)
BENCH_CONFIGS = {
    "clevrtr": (
        "runs/clevrtr/GTA/gta/config.yaml",
        dict(height=120, width=160, downsample=0),
        32,
        "gta_clevrtr_train_rays_per_sec",
        True,
    ),
    "msn_so3": (
        "runs/msn/GTA/gta_so3/config.yaml",
        dict(height=128, width=128, downsample=0),
        64,
        "gta_msn_so3_train_rays_per_sec",
        False,
    ),
    "re10k": (
        "runs/re10k/GTA/gta/config.yaml",
        dict(height=120, width=160, downsample=0),
        32,
        "gta_re10k_train_rays_per_sec",
        False,
    ),
}


def _contending_pids():
    """PIDs of OTHER heavy jobs sharing this box/TPU (the stale-run failure
    mode: a leftover nohup'd train.py multiplexes the tunneled chip and slows
    every bench step ~10x, silently corrupting the headline number)."""
    skip = set()
    pid = os.getpid()
    for _ in range(16):  # self + ancestor wrappers (timeout, shells, drivers)
        skip.add(pid)
        try:
            with open(f"/proc/{pid}/status") as f:
                pid = int(
                    next(l for l in f if l.startswith("PPid:")).split()[1]
                )
        except Exception:
            break
        if pid <= 1:
            break
    try:
        out = subprocess.run(
            ["ps", "-eo", "pid,args"], capture_output=True, text=True, timeout=10
        ).stdout
    except Exception:
        return []
    pids = []
    for line in out.splitlines()[1:]:
        pid, _, cmd = line.strip().partition(" ")
        if not pid.isdigit() or int(pid) in skip:
            continue
        if "python" in cmd and re.search(
            r"train(_dit)?\.py|profile_ops|bench\.py|evaluate\.py|check_flash_parity",
            cmd,
        ):
            pids.append(int(pid))
    return pids


def _xla_flops(lowered_compiled):
    """Total FLOPs XLA attributes to the step (excludes Pallas custom-calls,
    which XLA treats as opaque — those are added analytically)."""
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="clevrtr", choices=sorted(BENCH_CONFIGS))
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--repeats", type=int, default=REPEATS)
    ap.add_argument(
        "--bf16", action="store_true",
        help="bf16 compute policy (PSNR parity demonstrated; reference CLEVR config is fp32, so the default headline stays fp32)",
    )
    ap.add_argument(
        "--flash", default=None, choices=["auto", "on", "off", "fused"],
        help="override the attention path (default: config 'auto' = fused on TPU)",
    )
    args = ap.parse_args()
    yaml_path, overrides, default_batch, metric, anchored = BENCH_CONFIGS[args.config]
    batch, iters = args.batch or default_batch, args.iters

    cfg = load_config(f"/root/repo/{yaml_path}")
    data = dataclasses.replace(cfg.data, dataset="synthetic", **overrides)
    training = dataclasses.replace(
        cfg.training, batch_size=batch, mixed_prec=args.bf16 or cfg.training.mixed_prec
    )
    if args.flash is not None:
        training = dataclasses.replace(training, flash=args.flash)
    cfg = dataclasses.replace(cfg, data=data, training=training)

    contention = _contending_pids()
    if contention:
        print(
            f"# WARNING: other heavy processes share this device/box: "
            f"pids={contention} — the number below is NOT a clean measurement "
            f"(kill by exact PID and re-run)",
            file=sys.stderr,
        )

    ds = SyntheticScenes(cfg.data, "train", num_scenes=batch)
    batch_data = jax.tree.map(jnp.asarray, collate([ds[i] for i in range(batch)]))

    trainer = Trainer(cfg)
    state = trainer.init_state(batch_data)
    rng = jax.random.PRNGKey(0)

    # count Pallas-kernel FLOPs at trace time (XLA's cost model can't see
    # inside custom-calls); enable after init_state so only the train step
    # is counted
    from gta_tpu.ops import gta_fused

    gta_fused.FLOP_TRACE.clear()
    gta_fused.TRACE_FLOPS = True
    try:
        for _ in range(WARMUP):
            state, metrics = trainer.train_step(state, batch_data, rng)
        float(metrics["loss"])  # host fetch: hard sync
    finally:
        gta_fused.TRACE_FLOPS = False
    pallas_flops = sum(f + b for f, b in gta_fused.FLOP_TRACE) or None

    # Time `iters` chained steps between two host syncs, `repeats` times.
    # Per-step block_until_ready is unreliable over proxied/tunneled devices
    # (it can return before device completion); the state dependency chain
    # plus a final host fetch measures true sustained throughput. The median
    # over repeats defends against tunnel-latency spread; the reported
    # spread makes session-to-session variance visible in the JSON itself.
    windows = []
    for _ in range(max(1, args.repeats)):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = trainer.train_step(state, batch_data, rng)
        float(metrics["loss"])
        windows.append((time.perf_counter() - t0) / iters)
    step = float(np.median(windows))
    spread_pct = 100.0 * (max(windows) - min(windows)) / step if len(windows) > 1 else 0.0

    from gta_tpu.data.sampling import points_per_view

    # actual rays supervised per scene (per-view count is tile-aligned)
    rays_per_scene = cfg.data.num_target_views * points_per_view(
        cfg.data.num_points, cfg.data.num_target_views
    )
    rays_per_sec = batch * rays_per_scene / step

    # MFU against the MEASURED sustained bf16 peak of this chip: XLA-visible
    # FLOPs from compile-time cost analysis (cache-hit recompile) plus the
    # analytic count for the fused Pallas kernels.
    xla_flops = _xla_flops(trainer._train_step.lower(state, batch_data, rng).compile())
    flops_per_step = (xla_flops or 0.0) + (pallas_flops or 0.0)
    mfu = (
        round(flops_per_step / step / MEASURED_BF16_PEAK_FLOPS, 4)
        if flops_per_step and jax.devices()[0].platform != "cpu"
        else None
    )

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": (
                    round(rays_per_sec / ESTIMATED_A100_RAYS_PER_SEC, 3)
                    if anchored
                    else None
                ),
                "ms_per_step": round(step * 1e3, 2),
                "repeats": len(windows),
                "spread_pct": round(spread_pct, 2),
                "mfu": mfu,
                "flops_per_step": round(flops_per_step) if flops_per_step else None,
                "contention": contention or None,
            }
        )
    )
    print(
        f"# device={jax.devices()[0].device_kind} windows_ms="
        f"{[round(w * 1e3, 1) for w in windows]} batch={batch} "
        f"rays/step={batch * rays_per_scene} mixed_prec={cfg.training.mixed_prec} "
        f"xla_flops={xla_flops} pallas_flops={pallas_flops}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
