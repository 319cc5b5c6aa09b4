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
columns for m<0 channels flip sign. `so3_sign_map` builds the per-layer transform map.
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
# torch state_dict -> flax params: canonical implementation lives in the
# package (gta_tpu/utils/ref_import.py — it is the user-facing checkpoint
# importer); re-exported here for the parity tests.

from gta_tpu.utils.ref_import import (  # noqa: E402,F401
    so3_qkv_sign_fns,
    so3_sign_map,
    so3_signs,
    translate_key,
    transplant,
)


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
