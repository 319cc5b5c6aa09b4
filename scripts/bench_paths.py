"""Interleaved train-step benchmark: XLA einsum vs flash vs fused GTA paths.

Runs the flagship CLEVR-TR GTA config at the given batch sizes, timing N
chained steps per path in interleaved repetitions (micro-timings on the
tunneled chip vary +/-30%; interleaving cancels drift). Prints a table.

Usage: python scripts/bench_paths.py [--batches 8,32] [--iters 10] [--reps 3]
"""

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp

from gta_tpu.runtime import setup as _setup_cache

_setup_cache()

from gta_tpu.config import load_config
from gta_tpu.data.synthetic import SyntheticScenes, collate
from gta_tpu.train.trainer import Trainer

FLAGSHIP = "/root/repo/runs/clevrtr/GTA/gta/config.yaml"


def build(flash_mode, batch, mixed=False):
    cfg = load_config(FLAGSHIP)
    data = dataclasses.replace(
        cfg.data, dataset="synthetic", height=120, width=160, downsample=0
    )
    training = dataclasses.replace(
        cfg.training, batch_size=batch, flash=flash_mode, mixed_prec=mixed
    )
    cfg = dataclasses.replace(cfg, data=data, training=training)
    ds = SyntheticScenes(cfg.data, "train", num_scenes=batch)
    b = jax.tree.map(jnp.asarray, collate([ds[i] for i in range(batch)]))
    tr = Trainer(cfg)
    state = tr.init_state(b)
    return tr, state, b


def time_path(tr, state, batch, iters):
    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = tr.train_step(state, batch, rng)
    float(metrics["loss"])
    return (time.perf_counter() - t0) / iters, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,32")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--paths", default="off,on,fused")
    ap.add_argument("--mixed", action="store_true")
    args = ap.parse_args()
    paths = args.paths.split(",")

    for batch in [int(b) for b in args.batches.split(",")]:
        setups = {}
        for p in paths:
            setups[p] = build(p, batch, mixed=args.mixed)
            # warmup / compile
            _, s2 = time_path(*setups[p], 2)
            setups[p] = (setups[p][0], s2, setups[p][2])
        results = {p: [] for p in paths}
        for _ in range(args.reps):
            for p in paths:
                tr, st, b = setups[p]
                dt, st = time_path(tr, st, b, args.iters)
                setups[p] = (tr, st, b)
                results[p].append(dt * 1e3)
        for p in paths:
            times = results[p]
            print(
                f"batch={batch:3d} path={p:6s} "
                f"min={min(times):7.2f}ms med={sorted(times)[len(times)//2]:7.2f}ms "
                f"all={[round(t, 1) for t in times]}"
            )


if __name__ == "__main__":
    main()
