"""Tensor parallelism: attention-head / FFN sharding over the `model` axis.

GSPMD-style: instead of rewriting modules, we assign PartitionSpecs to the
parameter pytree by name and let XLA partition the computation. GTA's
per-head typed channel slices make heads the natural TP unit — every
group-rep application, softmax, and output projection is head-local, so
the only collective is the all-reduce after `to_out`/FFN-down matmuls
(inserted by XLA), riding ICI.

Sharding rules (kernel shapes are [in, out]):
  to_qkv / to_q / to_kv kernels -> P(None, "model")   (split heads on out)
  to_out kernels                -> P("model", None)   (split heads on in)
  FFN up (first Dense)          -> P(None, "model")
  FFN down (second Dense)       -> P("model", None)
  everything else               -> replicated

Use `shard_params(params, mesh)` after init/restore; the data batch is
sharded over `data` as usual (parallel/mesh.py). Composes with DP on a 2-D
(data, model) mesh.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gta_tpu.parallel.mesh import MODEL_AXIS


def _spec_for(path: tuple, leaf) -> P:
    keys = [getattr(k, "key", str(k)) for k in path]
    name = "/".join(keys)
    is_kernel = keys[-1] == "kernel"
    if not is_kernel or leaf.ndim != 2:
        return P()
    if any(s in name for s in ("to_qkv", "to_q/", "to_kv")) or name.endswith("to_q"):
        return P(None, MODEL_AXIS)
    if "to_out" in name:
        return P(MODEL_AXIS, None)
    # FeedForward: flax auto-names its two Dense layers Dense_0 / Dense_1
    if "ff_" in name and "Dense_0" in name:
        return P(None, MODEL_AXIS)
    if "ff_" in name and "Dense_1" in name:
        return P(MODEL_AXIS, None)
    return P()


def param_shardings(params: Any, mesh: Mesh):
    """NamedSharding pytree matching `params` with head/FFN TP rules."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    specs = [NamedSharding(mesh, _spec_for(path, leaf)) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params: Any, mesh: Mesh):
    """Place params on the mesh with TP shardings (others replicated)."""
    sh = param_shardings(params, mesh)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, sh)
