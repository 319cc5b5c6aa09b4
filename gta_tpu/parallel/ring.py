"""Ring attention over view-sharded KV blocks (sequence/context parallelism).

The reference has no sequence parallelism — it materializes full O(Tq x Tk)
attention on <=1.3k tokens (reference layers.py:202-224) and its only
length-scaling device is time-sliced ray chunking (trainer.py:154-171).
This module is the TPU-native scaling path planned in SURVEY §5.7(c): when
the input-view count grows beyond what one chip's VMEM/HBM holds, shard
keys *by view* over a mesh axis and ring-pass KV blocks over ICI while
queries stay local.

Views are the natural ring granule for GTA: every key-side rep table
(SE(3) extrinsic, SO(3) Wigner-D, per-token SO(2) rotors) is indexed by
view, so a view-sharded `GeomReps` carries exactly the tables its local KV
shard needs — the rep transform happens shard-locally *before* the ring,
and only transformed K/V ride the `ppermute`. The output untransform uses
query-side reps, which never leave the device.

Numerics: online (streaming) softmax in fp32 — each ring step folds one KV
block into running (max, sum, out) accumulators, exactly the flash
recurrence, so the result equals single-device softmax attention to fp32
round-off. Collective cost per step is 2 x [B, H, Tk/n, C] over ICI,
overlapped with the block matmuls by XLA's latency-hiding scheduler.

Use inside `shard_map` over a mesh axis (tests/test_ring.py drives an
8-virtual-device CPU mesh; `__graft_entry__.dryrun_multichip` compiles it
into the multi-chip validation path).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gta_tpu.config import GTAArgs
from gta_tpu.ops.gta import gta_transform_qkv, gta_untransform_out
from gta_tpu.ops.reps import GeomReps


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    axis_name: str,
) -> jnp.ndarray:
    """softmax(q k^T * scale) v with k/v sharded over `axis_name`.

    Call under shard_map. q: local [B, H, Tq, C] (replicated or
    query-sharded over an orthogonal axis); k, v: local KV shards
    [B, H, Tk_local, C]. Returns the local [B, H, Tq, C] output.
    """
    n = jax.lax.psum(1, axis_name)  # static axis size
    perm = [(i, (i + 1) % n) for i in range(n)]
    qf = q.astype(jnp.float32)

    def fold(o, m, l, kc, vc):
        s = jnp.einsum("bhqc,bhkc->bhqk", qf, kc.astype(jnp.float32)) * scale
        m_blk = jnp.max(s, -1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, -1, keepdims=True)
        o = o * alpha + jnp.einsum("bhqk,bhkc->bhqc", p, vc.astype(jnp.float32))
        return o, m_new, l

    def step(carry, _):
        o, m, l, kc, vc = carry
        o, m, l = fold(o, m, l, kc, vc)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (o, m, l, kc, vc), None

    # Derive the accumulators from q so their varying-axes type matches the
    # loop-carried value when q itself is sharded over the ring axis.
    o0 = qf * 0.0
    m0 = qf[..., :1] * 0.0 - jnp.inf
    l0 = qf[..., :1] * 0.0
    # n-1 rotating steps; the last block folds outside the scan so its KV
    # never rides a wasted final ppermute pair over ICI.
    (o, m, l, kc, vc), _ = jax.lax.scan(step, (o0, m0, l0, k, v), None, length=n - 1)
    o, _, l = fold(o, m, l, kc, vc)
    return (o / l).astype(q.dtype)


def ring_rep_specs(reps: GeomReps, k_axis: str):
    """shard_map in_specs pytree for a GeomReps with key-side tables sharded
    over `k_axis` (the ring axis) and query-side tables replicated.

    Per-view key tables (se3_k/so3_k, axis 1 = view) and per-token key
    tables (so2_k/t2_k rotor tuples, axis 1 = token) shard over the ring;
    everything query-side stays local to the device that owns the queries.
    """
    return _full_rep_specs(reps, None, k_axis, shard_q=False)


def _full_rep_specs(reps: GeomReps, data: str, seq: str, shard_q: bool):
    """PartitionSpec pytree for GeomReps inside the in-model shard_map:
    batch axis over `data`, key-side view/token axes over `seq`, query-side
    likewise when `shard_q` (encoder self-attention) else replicated."""
    from jax.sharding import PartitionSpec as P

    def spec_like(name, val):
        if val is None:
            return None
        axis1 = seq if (name.endswith("_k") or (shard_q and not name.startswith("flat"))) else None
        if isinstance(val, tuple):
            if name.startswith("so2"):
                return tuple(P(data, axis1) for _ in val)
            return tuple(P(data, axis1, None, None) for _ in val)
        return P(*((data, axis1) + (None,) * (val.ndim - 2)))

    return GeomReps(
        **{
            f.name: spec_like(f.name, getattr(reps, f.name))
            for f in reps.__dataclass_fields__.values()
        }
    )


def shapes_divide(mesh, values, specs) -> bool:
    """True iff every array axis a PartitionSpec assigns to a mesh axis
    divides that mesh axis size — shard_map hard-errors otherwise, so the
    in-model sharded paths fall back to replicated execution when this is
    False (odd-sized eval/visualize/render batches, --speed_test splits)."""
    sizes = dict(mesh.shape)

    def ok(val, spec):
        if val is None or spec is None:
            return True
        for d, axis in enumerate(spec):
            if axis is not None and val.shape[d] % sizes[axis]:
                return False
        return True

    flags = jax.tree.map(ok, values, specs, is_leaf=lambda x: x is None)
    return all(jax.tree.leaves(flags))


def ring_gta_sharded(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    reps: GeomReps,
    args: GTAArgs,
    trans_coeff: Optional[jnp.ndarray],
    scale: float,
    self_att: bool,
):
    """Training-path entry: GTA ring attention under the ambient mesh.

    Called from models/layers.Attention._gta when cfg.ring is set (the
    runtime enables it via config.with_ring_attention + `train.py
    --n-seq`). Requires `jax.set_mesh(mesh)` with a SEQ_AXIS of size > 1;
    silently falls back to the dense oracle otherwise so eval paths and
    CPU tests run unchanged.

    Layouts (B batch, H heads, T tokens):
      encoder self-attention: q AND kv token(view)-sharded over seq — true
        sequence parallelism, each device owns its views' output rows.
      decoder cross-attention: q (rays) replicated over seq, input-view KV
        ringed; output replicated over seq.
    Heads ride the `model` axis so the ring composes with TP.
    Differentiable: jax.shard_map grads flow through scan + ppermute
    (gradient parity vs the oracle in tests/test_ring.py).
    """
    import jax.sharding as jsh

    from gta_tpu.ops.gta import gta_attention  # fallback oracle
    from gta_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS

    mesh = jsh.get_abstract_mesh()

    def oracle():
        import functools

        from gta_tpu.ops.attention import dot_product_attention

        attn_fn = functools.partial(dot_product_attention, scale=scale)
        out, _ = gta_attention(q, k, v, attn_fn, reps, args, trans_coeff)
        return out

    if SEQ_AXIS not in getattr(mesh, "axis_names", ()) or mesh.shape[SEQ_AXIS] == 1:
        return oracle()

    from jax.sharding import PartitionSpec as P

    q_spec = P(DATA_AXIS, MODEL_AXIS, SEQ_AXIS if self_att else None, None)
    kv_spec = P(DATA_AXIS, MODEL_AXIS, SEQ_AXIS, None)
    rep_specs = _full_rep_specs(reps, DATA_AXIS, SEQ_AXIS, shard_q=self_att)
    tc_spec = None if trans_coeff is None else P()

    # odd-sized batches (eval fallback, visualize, render chunks) can't ride
    # the in-model shard_map; run them replicated instead of crashing
    if not shapes_divide(
        mesh, (q, k, v, reps), (q_spec, kv_spec, kv_spec, rep_specs)
    ):
        return oracle()

    fn = jax.shard_map(
        lambda q, k, v, reps, tc: ring_gta_attention(
            q, k, v, reps, args, tc, scale, SEQ_AXIS
        ),
        mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, rep_specs, tc_spec),
        out_specs=q_spec,
        check_vma=False,
    )
    return fn(q, k, v, reps, trans_coeff)


def ring_gta_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    reps: GeomReps,
    args: GTAArgs,
    trans_coeff: Optional[jnp.ndarray],
    scale: float,
    axis_name: str,
) -> jnp.ndarray:
    """GTA attention with view-sharded keys: transform locally, ring the core.

    `reps` is the *local* GeomReps: query-side tables cover the local
    queries, key-side tables cover only the local KV views (shard the view
    axis of se3_k/so3_k and the token axis of so2_k/t2_k alongside k/v).
    Semantically equal to ops/gta.gta_attention on the gathered arrays.
    """
    assert not args.euclid_sim and not args.elementwise_mul, (
        "ring path covers the production GTA variant; use the oracle for ablations"
    )
    qt, kt, vt = gta_transform_qkv(q, k, v, reps, args, trans_coeff)
    out = ring_attention(qt, kt, vt, scale, axis_name)
    if args.v_transform:
        out = gta_untransform_out(out, reps, args, trans_coeff)
    return out
