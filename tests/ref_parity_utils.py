"""Cross-framework parity utilities: run the ACTUAL reference PyTorch code
(/root/reference, CPU) side-by-side with gta_tpu and transplant weights.

Three jobs:
  1. `load_reference()` — import the reference with two repairs it needs to
     run at all in this snapshot: a regenerated `J_dense.pt` (its Wigner-J
     tables are a missing large blob, loaded at import time at
     wigner_d.py:8-9 — we rebuild them with
     scripts/gen_jdense_for_reference.py) and a `ray2rotation` shim (the
     symbol is imported at encoder.py:6 / decoder.py:9 but absent from
     gta.py; no run config exercises it).
  2. `transplant(state_dict, flax_params)` — translate every torch
     parameter into the matching flax leaf (Linear weights transposed,
     convs OIHW->HWIO, LayerNorm weight->scale). Asserts a FULL bijection:
     any unconsumed torch key or unassigned flax leaf is an error, so
     structural drift cannot pass silently.
  3. `batch_to_ref_inputs(batch)` — convert a gta_tpu SceneBatch (NHWC
     numpy) into the reference forward args + extras dict exactly as
     trainer.py:85-103 builds them.

so3 configs: the two frameworks use real-SH bases differing by the fixed
sign matrix S_l = diag(-1 for m<0) (see gen_jdense_for_reference.py), so
so3 feature channels transplant with an S-conjugation: qkv/out rows and
columns for m<0 channels flip sign. `so3_sign_vector` builds the pattern.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REFERENCE_DIR = "/root/reference"

_REF_CACHE = {}


def load_reference(workdir: str):
    """Import reference modules (torch). Returns the `source` package dict
    {models_nvs, encoder, decoder, layers, gta, torch}. Caches globally —
    import only happens once per process. `workdir` must be writable; a
    J_dense.pt is generated there and CWD points there during import."""
    if _REF_CACHE:
        return _REF_CACHE
    import torch  # noqa: F401  (ImportError -> caller skips)

    from scripts.gen_jdense_for_reference import write_jdense

    jd = os.path.join(workdir, "J_dense.pt")
    if not os.path.exists(jd):
        write_jdense(jd, 8)
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    old = os.getcwd()
    os.chdir(workdir)  # wigner_d.py loads 'J_dense.pt' relative to CWD
    try:
        import source.utils.gta as ref_gta

        if not hasattr(ref_gta, "ray2rotation"):
            # Missing from the snapshot (imported at encoder.py:6 but not
            # defined in gta.py); only the ray_to_se3 option would call it
            # and no run config sets ray_to_se3.
            def _missing(*a, **k):
                raise NotImplementedError(
                    "ray2rotation is absent from the reference snapshot"
                )

            ref_gta.ray2rotation = _missing
        import source.decoder as ref_decoder
        import source.encoder as ref_encoder
        import source.layers as ref_layers
        import source.models_nvs as ref_models

        _repair_reference(ref_encoder, ref_decoder, ref_layers, ref_gta)
    finally:
        os.chdir(old)
    _REF_CACHE.update(
        dict(
            torch=torch,
            models_nvs=ref_models,
            encoder=ref_encoder,
            decoder=ref_decoder,
            layers=ref_layers,
            gta=ref_gta,
        )
    )
    return _REF_CACHE


def _repair_reference(ref_encoder, ref_decoder, ref_layers, ref_gta):
    """Two minimal runtime repairs for bugs in the reference snapshot that
    make some of its OWN run configs crash (both documented in SURVEY §7.3):

    1. NqTq ordering bug: encoder.py:239 / decoder.py:325 read `NqTq`
       (token count), which is only assigned inside the so2 branch
       (encoder.py:197) — any config with se3>0 but so2==0 (gta_t2,
       gta_no2demb) raises UnboundLocalError. Repair: when that pattern is
       detected, run pre_compute_reps with a COPY of the kwargs that adds a
       tiny so2 entry. The injected so2 tables land in extras but are never
       consumed (attention slices by its own, unmodified f_dims), and the
       flattened vectors they complete are only read by elementwise_mul.

    2. elementwise_mul call bug: layers.py:424 passes `reps=extras` but
       multihead_vecrep_attention's parameter is named `extras`
       (gta.py:282) — TypeError on every call. Repair: an adapter that
       forwards reps -> extras (and drops f_dims, which the function never
       had).
    """

    def _needs_nqtq_fix(attn_kwargs):
        fd = attn_kwargs.get("f_dims", {})
        return fd.get("se3", 0) > 0 and fd.get("so2", 0) == 0

    def _patched_pre(orig):
        def pre(self, attn_kwargs, extras):
            if _needs_nqtq_fix(attn_kwargs):
                ak = dict(attn_kwargs)
                ak["f_dims"] = dict(ak["f_dims"], so2=4)
                ak.setdefault("so2", 1)
                ak.setdefault("max_freq_h", 1)
                ak.setdefault("max_freq_w", 1)
                return orig(self, ak, extras)
            return orig(self, attn_kwargs, extras)

        return pre

    if not getattr(ref_encoder.ImprovedSRTEncoder, "_nqtq_patched", False):
        ref_encoder.ImprovedSRTEncoder.pre_compute_reps = _patched_pre(
            ref_encoder.ImprovedSRTEncoder.pre_compute_reps
        )
        ref_encoder.ImprovedSRTEncoder._nqtq_patched = True
    if not getattr(ref_decoder.ImprovedSRTDecoder, "_nqtq_patched", False):
        ref_decoder.ImprovedSRTDecoder.pre_compute_reps = _patched_pre(
            ref_decoder.ImprovedSRTDecoder.pre_compute_reps
        )
        ref_decoder.ImprovedSRTDecoder._nqtq_patched = True

    # 3. FTL reads an undefined `self.trans_coeff` (models_nvs.py:66) — every
    #    ftl=True forward crashes. Register the obviously-intended parameter
    #    (same 0.01 init as the attention-level trans_coeff, layers.py:191).
    import source.models_nvs as ref_models
    import torch
    from torch import nn as torch_nn

    if not getattr(ref_models.TransformingSRT, "_ftl_patched", False):
        orig_init = ref_models.TransformingSRT.__init__

        def ftl_init(self, cfg):
            orig_init(self, cfg)
            if self.ftl:
                self.trans_coeff = torch_nn.Parameter(torch.tensor([0.01]))

        ref_models.TransformingSRT.__init__ = ftl_init
        ref_models.TransformingSRT._ftl_patched = True

    orig_vecrep = ref_gta.multihead_vecrep_attention

    def vecrep_adapter(q, k, v, attn_fn, f_dims=None, reps=None, **kwargs):
        return orig_vecrep(q, k, v, attn_fn, reps, **kwargs)

    ref_layers.multihead_vecrep_attention = vecrep_adapter


# ---------------------------------------------------------------------------
# torch state_dict -> flax params


def _translate_tokens(tokens):
    """Map one torch parameter path (list of '.'-split tokens) to the flax
    param path (tuple of str). Returns None for buffers to ignore."""
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
            # UNDEFINED self.trans_coeff (models_nvs.py:66) — _repair_reference
            # registers one; ours is the model-level ftl_trans_coeff param.
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


def _to_flax_value(torch_value, flax_leaf, is_kernel):
    """Orient a torch tensor to the flax leaf's shape.

    Kernels ALWAYS reorient (torch Linear is [out,in], Conv2d OIHW) — shape
    comparison alone is ambiguous for square Linears. Non-kernel leaves
    (biases, norm scales, rpe bias tables, trans_coeff) copy as-is.
    """
    w = torch_value.detach().cpu().numpy()
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


def transplant(state_dict, flax_params, so3_sign=None):
    """Build a flax params pytree from a torch state_dict.

    so3_sign: optional dict mapping flax path tuples to per-channel sign
    arrays (see `so3_sign_vector`) applied to qkv rows / out columns to
    convert between the two frameworks' real-SH bases.
    """
    import jax

    flat = dict(jax.tree_util.tree_flatten_with_path(flax_params)[0])

    def key_of(path):
        return tuple(p.key for p in path if hasattr(p, "key"))

    flax_leaves = {key_of(p): (p, v) for p, v in flat.items()}
    out = {}
    used = set()
    for tk, tv in state_dict.items():
        tokens = tk.split(".")
        fpath = _translate_tokens(tokens)
        full = ("params",) + fpath
        if full not in flax_leaves:
            raise KeyError(
                f"torch key {tk} -> {full} not found in flax params; "
                f"close matches: {[k for k in flax_leaves if k[-2:] == full[-2:]][:4]}"
            )
        _, leaf = flax_leaves[full]
        val = _to_flax_value(tv, leaf, is_kernel=full[-1] == "kernel")
        if so3_sign and full in so3_sign:
            val = so3_sign[full](val)
        out[full] = np.asarray(val, dtype=np.float32)
        used.add(full)
    missing = set(flax_leaves) - used
    if missing:
        raise KeyError(f"flax params never assigned: {sorted(missing)[:8]}")

    def rebuild(path, leaf):
        return out[key_of(path)]

    return jax.tree_util.tree_map_with_path(rebuild, flax_params)


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


# ---------------------------------------------------------------------------
# batch conversion


def batch_to_ref_inputs(batch):
    """SceneBatch (numpy/jax arrays, NHWC) -> (args, extras) for the
    reference model forward, mirroring trainer.py:85-103."""
    import torch

    def t(x):
        return torch.from_numpy(np.asarray(x, dtype=np.float32))

    input_images = t(batch.input_images).permute(0, 1, 4, 2, 3).contiguous()
    input_rays = t(batch.input_rays)
    target_rays = t(batch.target_rays)
    extras = {}
    if batch.input_transforms is not None:
        extras["input_transforms"] = t(batch.input_transforms)
    if batch.target_transforms is not None:
        extras["target_transforms"] = t(batch.target_transforms)
        extras["input_coord"] = t(batch.input_coord)
        extras["target_coord"] = t(batch.target_coord)
        extras["input_rays"] = input_rays
        extras["target_rays"] = target_rays
    args = (
        input_images,
        t(batch.input_camera_pos),
        input_rays,
        t(batch.target_camera_pos),
        target_rays,
    )
    return args, extras
