"""Worker for the two-process multihost test (tests/test_multihost.py).

Runs as `python tests/_multihost_worker.py <pid> <nproc> <port> <outfile>`:
initializes `jax.distributed` over localhost with 4 virtual CPU devices per
process (global mesh of 4*nproc), loads this host's shard of a synthetic
global batch, takes one real train step and one Trainer.evaluate pass, and
(process 0) writes the metrics as JSON.

With nproc=1 this doubles as the single-process golden: same global batch,
same seeds, no jax.distributed — the metrics must match the 2-process run
exactly (mean-of-equal-shards is exact; reduction is AVG over sorted keys,
reference common.py:80-102).
"""

import json
import os
import sys

pid, nproc, port, outfile = (
    int(sys.argv[1]),
    int(sys.argv[2]),
    sys.argv[3],
    sys.argv[4],
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gta_tpu.data.synthetic import SyntheticScenes, collate
from gta_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from gta_tpu.train.trainer import Trainer
from tests.test_trainer import tiny_config

GLOBAL_BATCH = 8
assert jax.device_count() == 4 * nproc, (jax.device_count(), nproc)
local_b = GLOBAL_BATCH // nproc

cfg = tiny_config(batch_size=GLOBAL_BATCH)
ds = SyntheticScenes(cfg.data, "train", num_scenes=32)


def local_batch(global_start: int):
    """This host's contiguous shard of the global batch starting at item
    `global_start` (host p owns rows [p*local_b, (p+1)*local_b) — matching
    make_array_from_process_local_data's device order)."""
    lo = global_start + pid * local_b
    return collate([ds[i] for i in range(lo, lo + local_b)])


mesh = make_mesh()  # data axis spans all 4*nproc devices
trainer = Trainer(cfg, mesh=mesh)

init_local = local_batch(0)
state = trainer.init_state(init_local, seed=0)
state = state.replace(
    params=replicate(state.params, mesh),
    opt_state=replicate(state.opt_state, mesh),
)

train_global = shard_batch(local_batch(0), mesh)
state, metrics = trainer.train_step(state, train_global, jax.random.PRNGKey(1))

# the --device-data path hands shard_batch device-resident local leaves;
# assembly must avoid the host round-trip yet produce the identical global
# array (rows AND sharding) as the host-path assembly
import jax.numpy as jnp

from gta_tpu.parallel.mesh import local_data

dev_global = shard_batch(jax.tree.map(jnp.asarray, local_batch(0)), mesh)
device_assembly_ok = all(
    a.sharding == b.sharding and np.array_equal(local_data(a), local_data(b))
    for a, b in zip(jax.tree.leaves(dev_global), jax.tree.leaves(train_global))
)

# two global eval batches (items 8..16 and 16..24), host-sharded like the
# loader's shard_index=process_index path
val_batches = [local_batch(8), local_batch(16)]
eval_metrics = trainer.evaluate(state.params, val_batches, mesh=mesh)

result = {
    "loss": float(metrics["loss"]),
    "grad_norm": float(metrics["grad_norm"]),
    "eval": {k: float(v) for k, v in eval_metrics.items()},
    "process_count": jax.process_count(),
    "device_count": jax.device_count(),
    "device_assembly_ok": bool(device_assembly_ok),
}
if pid == 0:
    with open(outfile, "w") as f:
        json.dump(result, f)
print(f"worker {pid}/{nproc}: {result}")
