"""Reference-checkpoint importer: convert a trained checkpoint of the
reference PyTorch implementation (/root/reference — `model.pt` written by
its `Checkpoint.save`, checkpoint.py:21-35, containing {encoder, decoder,
optimizer} state_dicts + scalar training state, train.py:301-305) into a
gta-tpu orbax checkpoint that `train.py` auto-resumes from and
`evaluate.py` evaluates.

This is the migration path for users of the reference: bring your
`model.pt` + `config.yaml`, get a TPU-native run directory — including the
AdamW first/second moments and step count, so training *continues* rather
than restarting optimizer state from zero.

The weight translation is the exact transform validated by the
cross-framework parity suite (tests/test_reference_parity.py: forward
pixels to fp32 roundoff and per-parameter gradient agreement on all 21
structurally-distinct run configs):

  * torch Linear [out, in] -> flax kernel [in, out] (transposed);
  * torch Conv2d OIHW      -> flax HWIO;
  * LayerNorm weight       -> scale;
  * so3 (Wigner-D) feature channels: the two frameworks use real-SH bases
    differing by the fixed sign matrix S_l = diag(-1 for m<0) (see
    scripts/gen_jdense_for_reference.py), absorbed into the q/k/v rows and
    out-projection columns of every attention layer (`so3_sign_map`).

Adam moments ride the same weight-space maps: `exp_avg` (first moment)
transforms exactly like the weight (orientation + sign), `exp_avg_sq`
(second moment, elementwise square) gets orientation only — a sign flip
squares away.

Full-bijection checking: every torch key must land on a flax leaf and
every flax leaf must be assigned (structural drift cannot pass silently).
The single allowed exception is the FTL latent-transform coefficient: the
reference *reads an undefined* `self.trans_coeff` (models_nvs.py:66), so
real reference checkpoints cannot contain it — our `ftl_trans_coeff`
keeps its init value and a warning is printed.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Iterable, Mapping, Optional, Tuple

import numpy as np

__all__ = [
    "translate_key",
    "flax_path_to_torch_key",
    "transplant",
    "so3_signs",
    "so3_qkv_sign_fns",
    "so3_sign_map",
    "load_reference_pt",
    "import_reference_checkpoint",
    "export_reference_checkpoint",
]


def _np(x) -> np.ndarray:
    """torch tensor or array-like -> numpy (no torch import required)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


# ---------------------------------------------------------------------------
# torch parameter path -> flax parameter path


def translate_key(torch_key: str) -> Tuple[str, ...]:
    """Map one torch parameter key (reference module naming) to the flax
    param path tuple (relative to the {'params': ...} root)."""
    tokens = torch_key.split(".")
    out = []
    i = 0
    while i < len(tokens):
        t = tokens[i]
        if t == "conv_blocks":
            blk = tokens[i + 1]
            layer = int(tokens[i + 2 + 1])  # 'layers', j
            assert tokens[i + 2] == "layers" and tokens[i + 4] == "weight"
            return tuple(out + [f"conv{blk}", f"Conv_{layer // 2}", "kernel"])
        if t == "layers" and i + 2 < len(tokens) and tokens[i + 2] in ("0", "1"):
            idx, which = tokens[i + 1], tokens[i + 2]
            rest = tokens[i + 3 :]
            if which == "0":  # PreNorm(attention)
                if rest[0] == "norm":
                    return tuple(
                        out
                        + [f"norm_attn_{idx}", "scale" if rest[1] == "weight" else "bias"]
                    )
                assert rest[0] == "fn"
                sub = rest[1:]
                if sub == ["attend", "tau"]:
                    # TemperatureAdjsutableSoftmax tau (layers.py:135-143)
                    return tuple(out + [f"attn_{idx}", "tau"])
                if sub[0] == "to_out":  # Sequential(linear, dropout)
                    assert sub[1] == "0"
                    leaf = "kernel" if sub[2] == "weight" else "bias"
                    return tuple(out + [f"attn_{idx}", "to_out", leaf])
                if sub[-1] in ("weight", "bias"):
                    leaf = "kernel" if sub[-1] == "weight" else "bias"
                    return tuple(out + [f"attn_{idx}"] + sub[:-1] + [leaf])
                return tuple(out + [f"attn_{idx}"] + sub)  # trans_coeff, *_bias, geo_weights
            else:  # PreNorm(feed-forward)
                if rest[0] == "norm":
                    return tuple(
                        out
                        + [f"norm_ff_{idx}", "scale" if rest[1] == "weight" else "bias"]
                    )
                assert rest[0] == "fn" and rest[1] == "net"
                dense = {"0": "Dense_0", "3": "Dense_1"}[rest[2]]
                leaf = "kernel" if rest[3] == "weight" else "bias"
                return tuple(out + [f"ff_{idx}", dense, leaf])
        if t == "input_mlp":  # Sequential(SRTLinear, ReLU, SRTLinear) (decoder.py:70-77)
            j = int(tokens[i + 1])
            leaf = "kernel" if tokens[i + 2] == "weight" else "bias"
            return tuple(out + [f"input_mlp{j // 2}", leaf])
        if t == "frustum_phi":  # Sequential(Linear, ReLU, Linear) (encoder.py:117)
            j = int(tokens[i + 1])
            leaf = "kernel" if tokens[i + 2] == "weight" else "bias"
            return tuple(out + [f"frustum_phi{j // 2}", leaf])
        if t == "trans_coeff" and i == 0:
            # FTL latent-transform coefficient: the reference reads an
            # UNDEFINED self.trans_coeff (models_nvs.py:66); ours is the
            # model-level ftl_trans_coeff param.
            return ("ftl_trans_coeff",)
        if t == "render_mlp":
            j = int(tokens[i + 1])
            name = f"render_mlp{j // 2}" if j // 2 < 4 else "render_mlp_out"
            leaf = "kernel" if tokens[i + 2] == "weight" else "bias"
            return tuple(out + [name, leaf])
        if t in ("weight", "bias") and i == len(tokens) - 1:
            return tuple(out + ["kernel" if t == "weight" else "bias"])
        out.append(t)
        i += 1
    return tuple(out)


def _orient_value(value, flax_leaf, is_kernel: bool) -> np.ndarray:
    """Orient a torch tensor/array to the flax leaf's shape.

    Kernels ALWAYS reorient (torch Linear is [out,in], Conv2d OIHW) — shape
    comparison alone is ambiguous for square Linears. Non-kernel leaves
    (biases, norm scales, rpe bias tables, trans_coeff) copy as-is.
    """
    w = _np(value)
    tgt = flax_leaf.shape
    if is_kernel:
        if w.ndim == 2 and w.T.shape == tgt:  # Linear [out,in] -> [in,out]
            return np.ascontiguousarray(w.T)
        if w.ndim == 4 and tuple(np.transpose(w, (2, 3, 1, 0)).shape) == tgt:
            return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))  # OIHW->HWIO
        raise ValueError(f"cannot orient kernel shape {w.shape} to {tgt}")
    if w.shape == tgt:
        return w
    if w.size == int(np.prod(tgt)):
        return w.reshape(tgt)
    raise ValueError(f"cannot orient shape {w.shape} to {tgt}")


def transplant(
    state_dict: Mapping[str, Any],
    flax_params,
    so3_sign: Optional[Dict[Tuple[str, ...], Callable]] = None,
    fill_missing: Iterable[Tuple[str, ...]] = (),
):
    """Build a flax params pytree from a torch state_dict (tensor- or
    numpy-valued).

    so3_sign: optional dict mapping flax path tuples to per-channel sign
    transforms (see `so3_sign_map`) applied to qkv rows / out columns to
    convert between the two frameworks' real-SH bases.

    fill_missing: flax path tuples allowed to be absent from the torch
    side; they keep their `flax_params` value (used for `ftl_trans_coeff`,
    which real reference checkpoints cannot contain — models_nvs.py:66
    reads an attribute that is never defined).
    """
    import jax

    flat = dict(jax.tree_util.tree_flatten_with_path(flax_params)[0])

    def key_of(path):
        return tuple(p.key for p in path if hasattr(p, "key"))

    flax_leaves = {key_of(p): (p, v) for p, v in flat.items()}
    out = {}
    used = set()
    for tk, tv in state_dict.items():
        fpath = translate_key(tk)
        full = ("params",) + fpath
        if full not in flax_leaves:
            raise KeyError(
                f"torch key {tk} -> {full} not found in flax params; "
                f"close matches: {[k for k in flax_leaves if k[-2:] == full[-2:]][:4]}"
            )
        _, leaf = flax_leaves[full]
        val = _orient_value(tv, leaf, is_kernel=full[-1] == "kernel")
        if so3_sign and full in so3_sign:
            val = so3_sign[full](val)
        out[full] = np.asarray(val, dtype=np.float32)
        used.add(full)
    missing = set(flax_leaves) - used
    allowed = {("params",) + tuple(p) for p in fill_missing}
    for m in missing & allowed:
        out[m] = np.asarray(flax_leaves[m][1], dtype=np.float32)
        print(f"ref_import: keeping init value for {m} (absent from checkpoint)")
    missing -= allowed
    if missing:
        raise KeyError(f"flax params never assigned: {sorted(missing)[:8]}")

    def rebuild(path, leaf):
        return out[key_of(path)]

    return jax.tree_util.tree_map_with_path(rebuild, flax_params)


# ---------------------------------------------------------------------------
# flax parameter path -> torch parameter key (inverse of translate_key)


def flax_path_to_torch_key(path: Tuple[str, ...]) -> str:
    """Map a flax param path tuple (relative to the {'params': ...} root)
    back to the reference's torch parameter key. Exact inverse of
    `translate_key` — tests/test_ref_import.py asserts the roundtrip via
    a strict `load_state_dict` on every parity config."""
    out = []
    i = 0
    n = len(path)
    while i < n:
        t = path[i]
        if t.startswith("conv") and t[4:].isdigit() and i + 2 < n:
            j = int(path[i + 1].split("_")[1])  # Conv_{j}
            assert path[i + 2] == "kernel"
            return ".".join(out + [f"conv_blocks.{t[4:]}.layers.{2 * j}.weight"])
        if t.startswith("norm_attn_"):
            idx = t[len("norm_attn_"):]
            leaf = "weight" if path[i + 1] == "scale" else "bias"
            return ".".join(out + [f"layers.{idx}.0.norm.{leaf}"])
        if t.startswith("norm_ff_"):
            idx = t[len("norm_ff_"):]
            leaf = "weight" if path[i + 1] == "scale" else "bias"
            return ".".join(out + [f"layers.{idx}.1.norm.{leaf}"])
        if t.startswith("attn_"):
            idx = t[len("attn_"):]
            sub = list(path[i + 1 :])
            if sub == ["tau"]:
                return ".".join(out + [f"layers.{idx}.0.fn.attend.tau"])
            if sub[0] == "to_out":  # Sequential(linear, dropout)
                leaf = "weight" if sub[1] == "kernel" else "bias"
                return ".".join(out + [f"layers.{idx}.0.fn.to_out.0.{leaf}"])
            if sub[-1] in ("kernel", "bias"):
                leaf = "weight" if sub[-1] == "kernel" else "bias"
                return ".".join(out + [f"layers.{idx}.0.fn"] + sub[:-1] + [leaf])
            return ".".join(out + [f"layers.{idx}.0.fn"] + sub)  # trans_coeff, *_bias, geo_weights
        if t.startswith("ff_"):
            idx = t[len("ff_"):]
            dense = {"Dense_0": "0", "Dense_1": "3"}[path[i + 1]]
            leaf = "weight" if path[i + 2] == "kernel" else "bias"
            return ".".join(out + [f"layers.{idx}.1.fn.net.{dense}.{leaf}"])
        if t.startswith("input_mlp"):
            j = int(t[len("input_mlp"):])
            leaf = "weight" if path[i + 1] == "kernel" else "bias"
            return ".".join(out + [f"input_mlp.{2 * j}.{leaf}"])
        if t.startswith("frustum_phi"):
            j = int(t[len("frustum_phi"):])
            leaf = "weight" if path[i + 1] == "kernel" else "bias"
            return ".".join(out + [f"frustum_phi.{2 * j}.{leaf}"])
        if t == "ftl_trans_coeff":
            return "trans_coeff"
        if t == "render_mlp_out":
            leaf = "weight" if path[i + 1] == "kernel" else "bias"
            return ".".join(out + [f"render_mlp.8.{leaf}"])
        if t.startswith("render_mlp"):
            j = int(t[len("render_mlp"):])
            leaf = "weight" if path[i + 1] == "kernel" else "bias"
            return ".".join(out + [f"render_mlp.{2 * j}.{leaf}"])
        if t == "kernel" and i == n - 1:
            return ".".join(out + ["weight"])
        if t == "bias" and i == n - 1:
            return ".".join(out + ["bias"])
        out.append(t)
        i += 1
    return ".".join(out)


def _orient_to_torch(w: np.ndarray) -> np.ndarray:
    """Undo `_orient_value` for kernels: flax [in,out] -> torch [out,in];
    HWIO -> OIHW."""
    if w.ndim == 2:
        return np.ascontiguousarray(w.T)
    if w.ndim == 4:
        return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))
    raise ValueError(f"unexpected kernel rank {w.ndim}")


# ---------------------------------------------------------------------------
# so3 real-SH basis conversion


def so3_signs(n_degrees: int) -> np.ndarray:
    """Per-channel signs for ONE so3 block [d_1 .. d_n] (sum (2l+1) wide):
    -1 on m<0 channels. Both frameworks tile the so3 head-slice as repeats
    of this block (reference gta.py:177-200; ops/gta.py)."""
    parts = []
    for l in range(1, n_degrees + 1):
        s = np.ones(2 * l + 1)
        s[:l] = -1.0
        parts.append(s)
    return np.concatenate(parts)


def so3_qkv_sign_fns(attn_cfg, heads: int, n_qkv: int):
    """Return (row_fn, out_col_fn) transforming transplanted weights so the
    reference's so3 basis maps onto ours.

    row_fn flips sign of output channels of the q/k/v projection lying in
    so3 slices; out_col_fn flips the matching input columns of to_out.
    n_qkv: how many qkv sections the projection output stacks (3 for
    to_qkv, 2 for to_kv, 1 for to_q).
    """
    fd = attn_cfg.gta.f_dims
    head_dim = fd.total
    st, ed = fd.slice_of("so3")
    block = so3_signs(attn_cfg.gta.so3)
    n_rep = (ed - st) // block.size
    sl = np.ones(head_dim)
    sl[st:ed] = np.tile(block, n_rep)
    per_section = np.tile(sl, heads)  # [H*D]

    def row_fn(w):  # flax kernel [in, n_qkv*H*D]
        signs = np.tile(per_section, n_qkv)
        return w * signs[None, :] if w.ndim == 2 else w * signs

    def out_col_fn(w):  # flax kernel [H*D, out]
        return w * per_section[:, None]

    return row_fn, out_col_fn


def so3_sign_map(cfg, params) -> Dict[Tuple[str, ...], Callable]:
    """Flax-path -> transform map flipping m<0 so3 channels (basis change)
    for every attention projection in the model described by `cfg`
    (a full gta_tpu Config). Empty for non-so3 configs."""
    signs: Dict[Tuple[str, ...], Callable] = {}

    def add(prefix, attn_cfg, heads, depth, cross):
        if not (attn_cfg.is_gta and attn_cfg.gta.f_dims.so3 > 0):
            return
        if attn_cfg.gta.elementwise_mul:
            return  # flattened-rep ablation: reps enter via rep_to_vec, not slices
        for i in range(depth):
            if cross:
                rq, _ = so3_qkv_sign_fns(attn_cfg, heads, 1)
                rkv, oc = so3_qkv_sign_fns(attn_cfg, heads, 2)
                signs[prefix + (f"attn_{i}", "to_q", "kernel")] = rq
                signs[prefix + (f"attn_{i}", "to_kv", "kernel")] = rkv
            else:
                r3, oc = so3_qkv_sign_fns(attn_cfg, heads, 3)
                signs[prefix + (f"attn_{i}", "to_qkv", "kernel")] = r3
            signs[prefix + (f"attn_{i}", "to_out", "kernel")] = oc

    add(
        ("params", "encoder", "transformer"),
        cfg.model.encoder.attn,
        cfg.model.encoder.heads,
        cfg.model.encoder.num_att_blocks,
        cross=False,
    )
    add(
        ("params", "decoder", "allocation_transformer", "transformer"),
        cfg.model.decoder.attn,
        cfg.model.decoder.heads,
        cfg.model.decoder.num_att_blocks,
        cross=True,
    )
    return signs


# ---------------------------------------------------------------------------
# checkpoint-level import


_SCALAR_KEYS = ("epoch_it", "it", "t", "loss_val_best", "run_id")


def load_reference_pt(path: str, trusted: bool = False):
    """Read a reference `model.pt` (checkpoint.py:21-35 format).

    Returns (param_sd, opt_sd, scalars):
      param_sd — one flat dict with 'encoder.'/'decoder.' prefixed keys,
                 in `model.parameters()` order (encoder first — the order
                 the reference optimizer indexes params by, train.py:211-215);
      opt_sd   — the torch optimizer state_dict or None;
      scalars  — the non-module entries (it / epoch_it / t / ...).

    trusted: the default safe loader (weights_only=True) rejects anything
    but tensors/primitives; checkpoints written by older torch versions may
    carry e.g. numpy scalars that need full unpickling — which can execute
    arbitrary code, so it is an explicit opt-in (`--trusted`), never a
    silent fallback.
    """
    import torch

    try:
        raw = torch.load(path, map_location="cpu", weights_only=not trusted)
    except Exception as e:
        if trusted:
            raise
        raise RuntimeError(
            f"safe (weights_only) load of {path} failed: {e}\n"
            "If this checkpoint comes from a source you trust, re-run with "
            "--trusted (full unpickling can execute code embedded in the file)."
        ) from e
    param_sd = {}
    for module in ("encoder", "decoder"):
        if module not in raw:
            raise KeyError(f"{path} has no '{module}' state_dict — not a reference checkpoint?")
        for k, v in raw[module].items():
            param_sd[f"{module}.{k}"] = v
    opt_sd = raw.get("optimizer")
    scalars = {k: raw[k] for k in _SCALAR_KEYS if k in raw}
    return param_sd, opt_sd, scalars


def _moment_dicts(param_sd, opt_sd):
    """Split the torch optimizer state into exp_avg / exp_avg_sq dicts keyed
    like param_sd, plus the Adam step count.

    torch indexes optimizer state by position in `model.parameters()`;
    with no registered buffers in any reference module (grep-verified),
    that order equals the concatenated state_dict key order used by
    `load_reference_pt`. Params Adam hasn't touched yet (lazy state init)
    get zero moments.
    """
    names = list(param_sd.keys())
    state = opt_sd.get("state", {})
    # indices may arrive as str after some (de)serialization paths
    state = {int(k): v for k, v in state.items()}
    idx_order = [i for g in opt_sd.get("param_groups", []) for i in g["params"]]
    if len(idx_order) != len(names):
        raise ValueError(
            f"optimizer has {len(idx_order)} params but checkpoint has "
            f"{len(names)} — cannot align moments"
        )
    mu, nu, count = {}, {}, 0
    for pos, idx in enumerate(idx_order):
        name = names[pos]
        s = state.get(idx)
        if s is None:
            mu[name] = np.zeros_like(_np(param_sd[name]))
            nu[name] = np.zeros_like(_np(param_sd[name]))
            continue
        mu[name] = s["exp_avg"]
        nu[name] = s["exp_avg_sq"]
        count = max(count, int(_np(s["step"])))
    return mu, nu, count


def _restore_opt_state(opt_state, mu_tree, nu_tree, count: int):
    """Graft transplanted Adam moments and step counts into a fresh optax
    opt_state (adam/adamw chains: ScaleByAdamState carries mu/nu; every
    counted state — bias correction, LR schedule — gets the step count so
    the schedule resumes where the reference left off)."""
    import jax.numpy as jnp
    import optax

    c = jnp.asarray(count, jnp.int32)

    def fix(s):
        if isinstance(s, optax.ScaleByAdamState):
            return s._replace(count=c, mu=mu_tree, nu=nu_tree)
        if hasattr(s, "_fields"):
            # namedtuple wrapper state (masked/MultiSteps/...): recurse into
            # fields so a nested Adam state is still found, and stamp any
            # step counter with the imported count
            rep = {f: fix(getattr(s, f)) for f in s._fields}
            if "count" in s._fields:
                rep["count"] = c
            return s._replace(**rep)
        if isinstance(s, (tuple, list)):
            return type(s)(fix(x) for x in s)
        return s

    return fix(opt_state)


def shrink_data(data_cfg):
    """Shrink data shapes while keeping every structural knob — used for
    the throwaway init batch here (param shapes are input-shape-independent
    — proven by the parity suite transplanting between full-config
    reference modules and small-shape flax inits on all 21 configs) and by
    the cross-framework parity tests for speed."""
    import dataclasses

    return dataclasses.replace(
        data_cfg,
        height=48,
        width=64,
        downsample=0,
        num_points=24,
        num_views=max(data_cfg.num_input_views + data_cfg.num_target_views, 5),
    )


def _shrunk_init_cfg(cfg):
    import dataclasses

    return dataclasses.replace(cfg, data=shrink_data(cfg.data))


def import_reference_checkpoint(
    config_path: str,
    pt_path: str,
    out_dir: str,
    import_optimizer: bool = True,
    seed: int = 0,
    name: str = "latest",
    trusted: bool = False,
):
    """Convert a reference `model.pt` into a gta-tpu orbax checkpoint under
    `<out_dir>/ckpts/<name>/` that train.py auto-resumes from (same config).

    Returns (scalars, param_counts). Requires torch (CPU is fine).
    """
    import jax.numpy as jnp

    from gta_tpu.config import load_config
    from gta_tpu.data.synthetic import SyntheticScenes, collate
    from gta_tpu.train.checkpoint import Checkpointer
    from gta_tpu.train.trainer import Trainer

    cfg = load_config(config_path)
    param_sd, opt_sd, ref_scalars = load_reference_pt(pt_path, trusted=trusted)

    icfg = _shrunk_init_cfg(cfg)
    trainer = Trainer(icfg)
    ds = SyntheticScenes(icfg.data, "train", num_scenes=2)
    batch = collate([ds[0], ds[1]])
    state = trainer.init_state(batch, seed=seed)

    sign_map = so3_sign_map(cfg, state.params)
    fill = [("ftl_trans_coeff",)] if getattr(cfg.model, "ftl", False) else []
    params = transplant(param_sd, state.params, so3_sign=sign_map, fill_missing=fill)

    it = int(ref_scalars.get("it", 0))
    opt_state = trainer.tx.init(params)
    if import_optimizer and opt_sd is not None:
        mu_sd, nu_sd, count = _moment_dicts(param_sd, opt_sd)
        import jax

        # first moment transforms like the weight (orientation + so3 signs);
        # second moment is an elementwise square — orientation only. The
        # fill target is a ZEROS tree: a param absent from the checkpoint
        # (ftl_trans_coeff) was never stepped, so its moments must be zero
        # — filling from `params` would inject the weight value as momentum.
        zeros = jax.tree.map(np.zeros_like, params)
        mu = transplant(mu_sd, zeros, so3_sign=sign_map, fill_missing=fill)
        nu = transplant(nu_sd, zeros, so3_sign=None, fill_missing=fill)

        nu = jax.tree.map(lambda x: np.abs(x), nu)  # guard: squares stay >= 0
        opt_state = _restore_opt_state(opt_state, mu, nu, count or it)

    state = state.replace(
        step=jnp.asarray(max(it, 0), jnp.int32), params=params, opt_state=opt_state
    )

    scalars = {
        "epoch_it": int(ref_scalars.get("epoch_it", -1)),
        "it": it,
        "t": float(ref_scalars.get("t", 0.0)),
    }
    # json round-trips ±Infinity (Python non-strict mode, same as our own
    # scalar writer); if absent, train.py falls back to its ±inf default.
    if "loss_val_best" in ref_scalars:
        scalars["loss_val_best"] = float(ref_scalars["loss_val_best"])
    if ref_scalars.get("run_id"):
        scalars["run_id"] = ref_scalars["run_id"]

    os.makedirs(out_dir, exist_ok=True)
    Checkpointer(out_dir).save(name, state, scalars)
    return scalars, trainer.param_counts(state)


# ---------------------------------------------------------------------------
# export (gta-tpu checkpoint -> reference model.pt)


def _find_adam_state(s):
    import optax

    if isinstance(s, optax.ScaleByAdamState):
        return s
    if isinstance(s, (tuple, list)):
        for x in s:
            r = _find_adam_state(x)
            if r is not None:
                return r
    return None


def _flax_to_torch_sd(tree, sign_map=None) -> Dict[str, np.ndarray]:
    """Flatten a params-shaped pytree ({'params': ...} root) into a torch
    state_dict keyed by reference names, torch-oriented. sign_map entries
    (involutions) are applied in flax orientation before reorienting."""
    import jax

    sd = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = tuple(p.key for p in path if hasattr(p, "key"))
        val = np.asarray(leaf, dtype=np.float32)
        if sign_map and key in sign_map:
            val = np.asarray(sign_map[key](val), dtype=np.float32)
        fpath = key[1:] if key and key[0] == "params" else key
        tk = flax_path_to_torch_key(fpath)
        if fpath[-1] == "kernel":
            val = _orient_to_torch(val)
        sd[tk] = val
    return sd


def export_reference_checkpoint(
    config_path: str,
    run_dir: str,
    pt_out: str,
    name: str = "latest",
    optimizer_order_from: Optional[str] = None,
    seed: int = 0,
    trusted: bool = False,
) -> Dict[str, Any]:
    """Convert a gta-tpu checkpoint (`<run_dir>/ckpts/<name>/`) into a
    reference-framework `model.pt` loadable by the reference's
    Checkpoint.load / evaluate.py — e.g. to run its LPIPS evaluation on a
    model trained here.

    Weights and scalar training state always export. AdamW moments export
    only when `optimizer_order_from` names ANY reference checkpoint of the
    same architecture (even an untrained save): torch indexes optimizer
    state positionally by `model.parameters()` order, which cannot be
    reconstructed from the flax pytree alone, so we take the key order from
    a real reference file. Without one the optimizer entry is omitted (the
    reference warns and trains on with fresh moments, checkpoint.py:51-55).

    Returns the scalar dict written into the file.
    """
    import torch

    from gta_tpu.config import load_config
    from gta_tpu.data.synthetic import SyntheticScenes, collate
    from gta_tpu.train.checkpoint import Checkpointer
    from gta_tpu.train.trainer import Trainer

    cfg = load_config(config_path)
    icfg = _shrunk_init_cfg(cfg)
    trainer = Trainer(icfg)
    ds = SyntheticScenes(icfg.data, "train", num_scenes=2)
    template = trainer.init_state(collate([ds[0], ds[1]]), seed=seed)
    state, scalars = Checkpointer(run_dir).restore(name, template)

    sign_map = so3_sign_map(cfg, state.params)
    full_sd = _flax_to_torch_sd(state.params, sign_map)

    out: Dict[str, Any] = {"encoder": {}, "decoder": {}}
    for tk, val in full_sd.items():
        module, _, rest = tk.partition(".")
        if module in ("encoder", "decoder"):
            # copy: jax buffers are non-writable and torch.from_numpy warns
            out[module][rest] = torch.from_numpy(np.array(val, copy=True))
        else:
            # model-level params (ftl trans_coeff): the reference checkpoint
            # format only carries encoder/decoder modules (train.py:180-191)
            print(f"ref_import: not exporting model-level param {tk} "
                  "(reference checkpoints cannot carry it)")

    adam = _find_adam_state(state.opt_state)
    if optimizer_order_from is not None and adam is not None:
        order_sd, _, _ = load_reference_pt(optimizer_order_from, trusted=trusted)
        names = list(order_sd.keys())
        mu_sd = _flax_to_torch_sd(adam.mu, sign_map)
        nu_sd = _flax_to_torch_sd(adam.nu, None)
        count = float(int(adam.count))
        opt_state = {}
        for i, tk in enumerate(names):
            if tk not in mu_sd:
                raise KeyError(f"order template param {tk} not in exported moments")
            opt_state[i] = {
                "step": torch.tensor(count),
                # copy: _flax_to_torch_sd returns non-writable views of jax
                # buffers for leaves that needed no reorientation
                "exp_avg": torch.from_numpy(np.array(mu_sd[tk], copy=True)),
                "exp_avg_sq": torch.from_numpy(np.array(nu_sd[tk], copy=True)),
            }
        # hyperparameter group template from a live torch optimizer, so the
        # key set matches whatever torch version loads this file
        dummy = torch.nn.Parameter(torch.zeros(1))
        opt_cls = torch.optim.Adam if cfg.training.noadamW else torch.optim.AdamW
        kw = {"lr": float(cfg.training.lr)}
        if not cfg.training.noadamW:
            kw["weight_decay"] = float(cfg.training.weight_decay)
        group = dict(opt_cls([dummy], **kw).state_dict()["param_groups"][0])
        group["params"] = list(range(len(names)))
        out["optimizer"] = {"state": opt_state, "param_groups": [group]}
    elif optimizer_order_from is not None:
        print("ref_import: no Adam state found in checkpoint; exporting weights only")

    for k in _SCALAR_KEYS:
        if k in scalars:
            out[k] = scalars[k]
    out.setdefault("it", int(state.step))

    os.makedirs(os.path.dirname(os.path.abspath(pt_out)), exist_ok=True)
    torch.save(out, pt_out)
    return {k: out[k] for k in _SCALAR_KEYS if k in out}
