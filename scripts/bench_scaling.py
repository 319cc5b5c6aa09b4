"""Scaling-efficiency harness: rays/s at 1 device vs N devices.

BASELINE.md targets >=85% scaling efficiency at >=2 hosts. This harness
measures train-step throughput on a 1-device mesh and on the full
n-device data-parallel mesh (global batch scaled with the mesh so
per-device work is constant — weak scaling), and reports
efficiency = rays_per_sec(N) / (N * rays_per_sec(1)).

On the single-chip tunnel this only validates the mechanics; on a real
pod slice run it as-is per host. For a hardware-free demonstration use
the virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m scripts.bench_scaling --per-device-batch 2 --iters 5

Usage: python -m scripts.bench_scaling [--per-device-batch 8] [--iters 10]
"""

import argparse
import dataclasses
import json
import os
import time

# honor explicit cpu request before jax init (axon plugin overrides env)
_want = os.environ.get("JAX_PLATFORMS", "")
import jax

if _want and "axon" not in _want and "tpu" not in _want:
    jax.config.update("jax_platforms", _want)

import jax.numpy as jnp

from gta_tpu.runtime import setup as _setup_cache

_setup_cache()

from gta_tpu.config import load_config
from gta_tpu.data.synthetic import SyntheticScenes, collate
from gta_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from gta_tpu.train.trainer import Trainer

FLAGSHIP = "/root/repo/runs/clevrtr/GTA/gta/config.yaml"


def measure(n_devices: int, per_device_batch: int, iters: int, size: int):
    batch_size = n_devices * per_device_batch
    cfg = load_config(FLAGSHIP)
    data = dataclasses.replace(
        cfg.data, dataset="synthetic", height=size, width=size, downsample=0,
        num_points=512,
    )
    training = dataclasses.replace(cfg.training, batch_size=batch_size)
    cfg = dataclasses.replace(cfg, data=data, training=training)

    mesh = make_mesh(n_data=n_devices, devices=jax.devices()[:n_devices])
    trainer = Trainer(cfg, mesh=mesh)
    ds = SyntheticScenes(cfg.data, "train", num_scenes=batch_size)
    batch = jax.tree.map(jnp.asarray, collate([ds[i] for i in range(batch_size)]))
    batch = shard_batch(batch, mesh)
    state = trainer.init_state(batch)
    state = state.replace(
        params=replicate(state.params, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    rng = jax.random.PRNGKey(0)
    for _ in range(2):
        state, metrics = trainer.train_step(state, batch, rng)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer.train_step(state, batch, rng)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    return batch_size * cfg.data.num_points / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--size", type=int, default=64, help="square image size")
    args = ap.parse_args()

    n = len(jax.devices())
    r1 = measure(1, args.per_device_batch, args.iters, args.size)
    out = {"devices": 1, "rays_per_sec": round(r1, 1)}
    print(json.dumps(out))
    if n > 1:
        rn = measure(n, args.per_device_batch, args.iters, args.size)
        eff = rn / (n * r1)
        print(json.dumps({
            "devices": n,
            "rays_per_sec": round(rn, 1),
            "scaling_efficiency": round(eff, 4),
        }))


if __name__ == "__main__":
    main()
