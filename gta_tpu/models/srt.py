"""SRT / TransformingSRT model wrappers (reference models_nvs.py).

The full forward pass is a pure function of (params, SceneBatch, rng):
geometry contexts are built with pure functions and threaded explicitly.
TSRT flattens [B, Nt, P] target queries into [B, Nt*P] batches
(models_nvs.py:81-86). The FTL baseline transforms the *latent* by camera
matrices outside attention (models_nvs.py:61-80) — implemented here with
its own learnable trans_coeff (the reference reads an undefined attribute
on this path; models_nvs.py:66)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from gta_tpu.config import ModelConfig
from gta_tpu.geometry.se3 import se3_inverse, scale_mask
from gta_tpu.models.context import AttnContext, SceneBatch
from gta_tpu.models.encoder import SRTEncoder, build_encoder_context
from gta_tpu.models.decoder import SRTDecoder, build_decoder_context


class SRT(nn.Module):
    """Encoder-decoder novel-view-synthesis model."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = SRTEncoder(self.cfg.encoder, dtype=self.dtype)
        self.decoder = SRTDecoder(self.cfg.decoder, dtype=self.dtype)

    def encode(self, batch: SceneBatch, deterministic: bool = True):
        ctx = build_encoder_context(self.cfg.encoder, batch)
        z = self.encoder(
            batch.input_images,
            batch.input_camera_pos,
            batch.input_rays,
            ctx,
            deterministic,
        )
        return z, ctx

    def decode(
        self,
        z: jnp.ndarray,
        batch: SceneBatch,
        enc_ctx: Optional[AttnContext] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, dict]:
        ctx = build_decoder_context(self.cfg.decoder, batch, enc_ctx)
        x = batch.target_camera_pos
        rays = batch.target_rays
        if x.ndim == 4:  # [B, Nt, P, 3] -> [B, Nt*P, 3] (models_nvs.py:81-86)
            x = x.reshape(x.shape[0], -1, 3)
            rays = rays.reshape(rays.shape[0], -1, 3)
        return self.decoder(z, x, rays, ctx, deterministic)

    def __call__(self, batch: SceneBatch, deterministic: bool = True):
        z, enc_ctx = self.encode(batch, deterministic)
        return self.decode(z, batch, enc_ctx, deterministic)


class TransformingSRT(SRT):
    """`tsrt` model type; adds the FTL latent-transform baseline."""

    def setup(self):
        super().setup()
        if self.cfg.ftl:
            self.ftl_trans_coeff = self.param(
                "ftl_trans_coeff", nn.initializers.constant(0.01), (1,)
            )

    def decode(self, z, batch, enc_ctx=None, deterministic=True):
        if not self.cfg.ftl:
            return super().decode(z, batch, enc_ctx, deterministic)

        # FTL: z -> inv(input extrinsic) z, then per-target-view extrinsic z
        iT = batch.input_transforms  # [B, Ni, 4, 4]
        tT = batch.target_transforms  # [B, Nt, 4, 4]
        B, Ni, Nt = iT.shape[0], iT.shape[1], tT.shape[1]
        msk = scale_mask(self.ftl_trans_coeff, z.dtype)
        iT = iT * msk
        tT = tT * msk
        _, T, C = z.shape
        zr = z.reshape(B, Ni, T // Ni, C // 4, 4)
        zr = jnp.einsum("bnij,bntcj->bntci", se3_inverse(iT), zr)

        x = batch.target_camera_pos  # [B, Nt, P, 3]
        rays = batch.target_rays
        pixels_list = []
        for n in range(Nt):
            z_t = jnp.einsum("bij,bntcj->bntci", tT[:, n], zr).reshape(B, T, C)
            view_batch = batch.replace(
                target_coord=batch.target_coord[:, n : n + 1]
                if batch.target_coord is not None
                else None,
                target_transforms=tT[:, n : n + 1],
            )
            ctx = build_decoder_context(self.cfg.decoder, view_batch, enc_ctx)
            pix, _ = self.decoder(z_t, x[:, n], rays[:, n], ctx, deterministic)
            pixels_list.append(pix)
        return jnp.stack(pixels_list, 1).reshape(B, -1, 3), {}


def build_model(cfg: ModelConfig, dtype=jnp.float32) -> SRT:
    if cfg.model_type == "srt":
        return SRT(cfg, dtype=dtype)
    if cfg.model_type == "tsrt":
        return TransformingSRT(cfg, dtype=dtype)
    raise ValueError(f"unknown model_type {cfg.model_type}")
