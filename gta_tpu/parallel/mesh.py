"""Device mesh and sharding utilities.

The training loop is data-parallel over a 1-D `data` mesh axis: the batch
(and target rays within it) are sharded across devices, parameters are
replicated, and XLA inserts the gradient all-reduce over ICI from the
sharding annotations — the TPU-native replacement for the reference's
NCCL DDP (common.py:18-30, train.py:183-186). A `model` axis is reserved
for tensor parallelism over attention heads (GTA's per-head typed slices
shard cleanly along heads).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None, n_seq: int = 1
) -> Mesh:
    """(data, seq, model) mesh over the available devices.

    Size-1 axes are kept so PartitionSpecs can always name them; `seq` is
    the sequence-parallel ring axis (parallel/ring.py), placed between
    data and model so ring ppermutes ride neighbouring ICI links within a
    data replica."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_model * n_seq)
    devs = np.asarray(devices[: n_data * n_seq * n_model]).reshape(
        n_data, n_seq, n_model
    )
    return Mesh(devs, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every leaf with its batch axis sharded over `data`.

    Single-host: a plain device_put. Multi-host: each process holds only
    its LOCAL batch shard (the loader shards by process_index, reference
    multishapenet.py:110-138), so the global array is assembled from
    process-local data — device_put would wrongly treat the local shard as
    the global value. Device-resident leaves (--device-data generates the
    batch in-jit) are assembled with device-to-device slices instead of
    `np.asarray` — a host round-trip per step would reintroduce exactly
    the ingest bottleneck on-device generation exists to remove."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        def assemble(x):
            if isinstance(x, jax.Array):
                return _global_from_local_device_array(x, sh)
            return jax.make_array_from_process_local_data(sh, np.asarray(x))

        return jax.tree.map(assemble, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def _global_from_local_device_array(x, sh: NamedSharding):
    """Assemble a globally-sharded array from this process's device-resident
    local batch rows (every process holds the same number of rows)."""
    global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
    idx_map = sh.addressable_devices_indices_map(global_shape)
    spans = {
        d: (s[0].start or 0, s[0].stop if s[0].stop is not None else global_shape[0])
        for d, s in idx_map.items()
    }
    base = min(start for start, _ in spans.values())
    shards = [
        jax.device_put(x[start - base : stop - base], d)
        for d, (start, stop) in spans.items()
    ]
    return jax.make_array_from_single_device_arrays(global_shape, sh, shards)


def local_data(x) -> np.ndarray:
    """This process's rows of a (possibly globally sharded) array,
    concatenated over the leading axis in shard order. Works for numpy
    inputs and fully-replicated arrays too."""
    if not hasattr(x, "addressable_shards"):
        return np.asarray(x)
    shards = sorted(x.addressable_shards, key=lambda s: (s.index[0].start or 0))
    rows = []
    seen = set()
    for s in shards:
        key = (s.index[0].start or 0, s.index[0].stop)
        if key in seen:  # replicated over a non-data axis: one copy is enough
            continue
        seen.add(key)
        rows.append(np.asarray(s.data))
    return np.concatenate(rows, 0)


def replicate(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
