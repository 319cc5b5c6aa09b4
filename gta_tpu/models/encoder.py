"""SRT-style multi-view patch encoder (reference encoder.py:36-345).

NHWC layout throughout (TPU-native). The conv stem downsamples by
2**num_conv_blocks; patch tokens from all views are concatenated and run
through a depth-`num_att_blocks` self-attention transformer whose attention
method is pluggable. Geometry context (AttnContext) is built by the pure
function `build_encoder_context` — the functional replacement of the
reference's extras-dict mutation in pre_compute_reps (encoder.py:183-265).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gta_tpu.config import EncoderConfig
from gta_tpu.geometry.coords import posenc_2d_grid, ray_posenc
from gta_tpu.geometry.plucker import plucker_params, plucker_dist, plucker_posenc
from gta_tpu.geometry.frustum import frustum_pixel_points
from gta_tpu.geometry.se3 import se3_inverse, rigid_transform
from gta_tpu.models.context import AttnContext, SceneBatch
from gta_tpu.models.layers import Transformer


def downsample_grid(x: jnp.ndarray, num_steps: int) -> jnp.ndarray:
    """Strided center-sample downsample of [..., H, W, C] grids
    (reference common.py:105-110)."""
    if not num_steps or num_steps < 1:
        return x
    stride = 2**num_steps
    return x[..., stride // 2 :: stride, stride // 2 :: stride, :]


class SRTConvBlock(nn.Module):
    """Conv3x3(s1)-ReLU-Conv3x3(s2)-ReLU, bias-free (encoder.py:16-33)."""

    hdim: int
    odim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        odim = self.odim if self.odim is not None else 2 * self.hdim
        x = nn.Conv(self.hdim, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(odim, (3, 3), strides=2, padding=1, use_bias=False, dtype=self.dtype)(x)
        return nn.relu(x)


def build_encoder_context(
    cfg: EncoderConfig,
    batch: SceneBatch,
    pose_octaves: int = 15,
    ray_octaves: int = 15,
) -> AttnContext:
    """Precompute the encoder-side geometry context (pure function)."""
    from gta_tpu.ops.reps import encoder_reps

    attn = cfg.attn
    ctx = AttnContext(
        input_transforms=batch.input_transforms,
        target_transforms=batch.target_transforms,
        input_coord=batch.input_coord,
        target_coord=batch.target_coord,
    )

    if attn.is_gta:
        geom = encoder_reps(
            attn.gta,
            input_coord=batch.input_coord,
            input_transforms=batch.input_transforms,
            input_rays=(
                downsample_grid(batch.input_rays, 3).reshape(
                    *batch.input_rays.shape[:2], -1, 3
                )
                if attn.gta.ray_to_se3
                else None
            ),
        )
        ctx = ctx.replace(geom=geom)
    elif attn.method in ("ape", "mln"):
        # fixed-grid 2D PE over post-stem patches (encoder.py:309-313).
        # NOTE the reference reshapes the [C, H, W] tensor STRAIGHT to
        # [-1, C] without transposing — a channel-major scramble of the
        # token/channel assignment. The published models trained with that
        # table, so we reproduce it bit-for-bit (weight-transplant parity,
        # tests/test_reference_parity.py) rather than "fix" it.
        H, W = batch.input_images.shape[2:4]
        s = 2**cfg.num_conv_blocks
        pe = posenc_2d_grid(180, H // s, W // s).reshape(-1, 180)
        B, N = batch.input_images.shape[:2]
        emb = jnp.broadcast_to(jnp.asarray(pe)[None, None], (B, N, pe.shape[0], 180))
        ctx = ctx.replace(input_coord_emb=emb)
    elif attn.method == "repast":
        # Rays/positions of all patches re-expressed in each key view's frame
        # (reference encoder.py:122-146).
        tfs = batch.input_transforms  # [B, N, 4, 4]
        B, N = tfs.shape[:2]
        rays = downsample_grid(batch.input_rays, 3).reshape(B, N, -1, 3)  # [B, N, L, 3]
        pos = jnp.broadcast_to(batch.input_camera_pos[:, :, None], rays.shape)

        pos_key = rigid_transform(tfs, pos, 1.0)
        rays_key = rigid_transform(tfs, rays, 0.0)
        key_emb = ray_posenc(pos_key, rays_key, pose_octaves, cfg.pos_start_octave, ray_octaves)

        T = N * rays.shape[2]
        pos_all = jnp.broadcast_to(pos.reshape(B, 1, T, 3), (B, N, T, 3))
        rays_all = jnp.broadcast_to(rays.reshape(B, 1, T, 3), (B, N, T, 3))
        pos_q = rigid_transform(tfs, pos_all, 1.0)
        rays_q = rigid_transform(tfs, rays_all, 0.0)
        query_emb = ray_posenc(pos_q, rays_q, pose_octaves, cfg.pos_start_octave, ray_octaves)
        query_emb = jnp.swapaxes(query_emb, 1, 2)  # [B, T, Nk, 180]
        ctx = ctx.replace(key_ray_emb=key_emb, query_ray_emb=query_emb)
    elif attn.method == "gbt":
        # Plücker pairwise distances + late-fusion PE (encoder.py:148-163)
        rays = downsample_grid(batch.input_rays, 3)
        B, N = rays.shape[:2]
        rays = rays.reshape(B, N, -1, 3)
        pos = jnp.broadcast_to(batch.input_camera_pos[:, :, None], rays.shape)
        pl = plucker_params(jnp.concatenate([pos, rays], -1)).reshape(B, -1, 6)
        ctx = ctx.replace(
            plucker_dist=plucker_dist(pl, pl),
            gbt_ray_emb=plucker_posenc(pl),
            gbt_ray_input=pl,
        )
    return ctx


class SRTEncoder(nn.Module):
    """Improved SRT encoder with pluggable attention method."""

    cfg: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # [B, N, H, W, 3]
        camera_pos: jnp.ndarray,  # [B, N, 3]
        rays: jnp.ndarray,  # [B, N, H, W, 3]
        ctx: AttnContext,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        B, N, H, W, _ = images.shape
        x = images.reshape(B * N, H, W, 3).astype(self.dtype)

        # input embeddings concatenated to RGB (reference encoder.py:293-303)
        if cfg.emb == "ray" and cfg.attn.method != "repast":
            pos = jnp.broadcast_to(camera_pos.reshape(B * N, 1, 1, 3), (B * N, H, W, 3))
            emb = ray_posenc(pos, rays.reshape(B * N, H, W, 3), 15, cfg.pos_start_octave, 15)
            x = jnp.concatenate([x, emb.astype(self.dtype)], -1)
        elif cfg.emb == "planar":
            emb = jnp.asarray(np.transpose(posenc_2d_grid(180, H, W), (1, 2, 0)), self.dtype)
            x = jnp.concatenate([x, jnp.broadcast_to(emb[None], (B * N, H, W, 180))], -1)

        # conv stem: /2 per block (encoder.py:86-92)
        x = SRTConvBlock(hdim=cfg.dim // 8, dtype=self.dtype, name="conv0")(x)
        cur = cfg.dim // 4
        for i in range(1, cfg.num_conv_blocks):
            x = SRTConvBlock(hdim=cur, dtype=self.dtype, name=f"conv{i}")(x)
            cur *= 2
        x = nn.Conv(cfg.attdim, (1, 1), dtype=self.dtype, name="per_patch_linear")(x)

        Ha, Wa = x.shape[1:3]

        # per-method post-stem embeddings (encoder.py:315-332)
        if cfg.emb == "camera_planar":
            pe = jnp.asarray(np.transpose(posenc_2d_grid(180, Ha, Wa), (1, 2, 0)), self.dtype)
            emb_2dpos = nn.Dense(cfg.attdim, dtype=self.dtype, name="lin_planar")(pe)
            pose = ctx.input_transforms[..., :3, :].reshape(B * N, 12).astype(self.dtype)
            emb_cam = nn.Dense(cfg.attdim, dtype=self.dtype, name="lin_camera")(pose)
            x = x + emb_2dpos[None] + emb_cam[:, None, None, :]
        elif cfg.attn.method == "gbt":
            gbt = nn.Dense(cfg.attdim, dtype=self.dtype, name="lin_ray")(
                ctx.gbt_ray_emb.astype(self.dtype)
            )  # [B, N*Ha*Wa, attdim]
            x = x + gbt.reshape(B * N, Ha, Wa, cfg.attdim)
        elif cfg.attn.method == "frustum_posemb":
            p3d = frustum_pixel_points(
                ctx.input_coord,
                se3_inverse(ctx.input_transforms),
                cfg.attn.frustum_D,
                dmin=cfg.attn.frustum_dmin,
                dmax=cfg.attn.frustum_dmax,
            )  # [B, N, T', D*4]
            if cfg.attn.frustum_normalize:
                p3d = 0.01 * p3d
            if cfg.attn.frustum_fourier:
                p3d = plucker_posenc(p3d, cfg.attn.frustum_freqs)
            h = nn.Dense(cfg.attdim * 2, dtype=self.dtype, name="frustum_phi0")(
                p3d.astype(self.dtype)
            )
            h = nn.relu(h)
            emb = nn.Dense(cfg.attdim, dtype=self.dtype, name="frustum_phi1")(h)
            x = x + emb.reshape(B * N, Ha, Wa, cfg.attdim)

        x = x.reshape(B, N * Ha * Wa, cfg.attdim)

        x = Transformer(
            dim=cfg.attdim,
            depth=cfg.num_att_blocks,
            heads=cfg.heads,
            dim_head=cfg.attdim // cfg.heads,
            mlp_dim=cfg.attdim * 2,
            dropout=cfg.dropout,
            kv_dim=None,
            attn=cfg.attn,
            dtype=self.dtype,
            name="transformer",
        )(x, None, ctx, deterministic)
        return x
