"""ZeRO-1: optimizer-state sharding over the `data` mesh axis.

Params stay replicated (or TP-sharded on the `model` axis); the Adam/
AdamW moment tensors are partitioned across data-parallel devices so
each device stores and updates only 1/N of the optimizer state. On TPU
this is annotation-only GSPMD: constraining the moment leaves to a
`data` sharding makes XLA reduce-scatter gradients into the moment
update and all-gather the parameter delta — the ZeRO-1 communication
pattern over ICI, with no hand-written collectives.

This fills SURVEY.md §2.2's last parallelism row ("FSDP/ZeRO: ...
optionally shard optimizer state along data axis"). The reference has
no equivalent — plain DDP replicates optimizer state on every rank
(/root/reference/train.py:183-186,207-215).

Sharding rule per optimizer-state leaf: start from the TP spec implied
by its parameter path (moments mirror the param tree, so the same
path-based rules from parallel/tp.py apply), then shard the first
still-unsharded axis whose size divides the data-axis width. Leaves
with no such axis (scalars, tiny biases) stay as-is — correctness never
depends on a leaf being sharded.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gta_tpu.parallel.mesh import DATA_AXIS
from gta_tpu.parallel.tp import _spec_for as _tp_spec_for


def _zero_spec(path: tuple, leaf, n_data: int, tp: bool) -> P:
    base = _tp_spec_for(path, leaf) if tp else P()
    if getattr(leaf, "ndim", 0) == 0 or n_data <= 1:
        return base
    entries = list(base) + [None] * (leaf.ndim - len(base))
    for i in range(leaf.ndim):
        if entries[i] is None and leaf.shape[i] % n_data == 0 and leaf.shape[i] >= n_data:
            entries[i] = DATA_AXIS
            break
    return P(*entries)


def opt_state_shardings(opt_state: Any, mesh: Mesh, tp: bool = False):
    """NamedSharding pytree for `opt_state` with ZeRO-1 data-axis sharding.

    tp: also apply the `model`-axis TP rules (parallel/tp.py) so ZeRO-1
    composes with tensor parallelism on a 2-D (data, model) mesh.
    """
    n_data = mesh.shape.get(DATA_AXIS, 1)
    flat = jax.tree_util.tree_flatten_with_path(opt_state)[0]
    treedef = jax.tree_util.tree_structure(opt_state)
    shardings = [
        NamedSharding(mesh, _zero_spec(path, leaf, n_data, tp)) for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_opt_state(opt_state: Any, mesh: Mesh, tp: bool = False):
    """Place the optimizer state on the mesh with ZeRO-1 shardings."""
    sh = opt_state_shardings(opt_state, mesh, tp=tp)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), opt_state, sh)
