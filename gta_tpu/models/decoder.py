"""Ray-conditioned cross-attention decoder (reference decoder.py).

RayPredictor: query embeddings (ray PE / learned-const / planar) cross-
attend into the scene latent through a depth-2 transformer; a 4-hidden-layer
render MLP maps the result to sigmoid RGB. Geometry context comes from the
pure function `build_decoder_context` (replacing decoder.pre_compute_reps,
decoder.py:247-353).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from gta_tpu.config import DecoderConfig
from gta_tpu.geometry.coords import posenc_2d_coord, ray_posenc
from gta_tpu.geometry.plucker import plucker_params, plucker_dist, plucker_posenc
from gta_tpu.geometry.frustum import frustum_pixel_points
from gta_tpu.geometry.se3 import se3_inverse, rigid_transform
from gta_tpu.models.context import AttnContext, SceneBatch
from gta_tpu.models.layers import Transformer, srt_linear_init
from gta_tpu.ops.reps import decoder_reps
from gta_tpu.models.encoder import downsample_grid


def build_decoder_context(
    cfg: DecoderConfig,
    batch: SceneBatch,
    enc_ctx: Optional[AttnContext] = None,
) -> AttnContext:
    """Precompute decoder-side geometry context; reuses encoder key tables."""
    attn = cfg.attn
    ctx = AttnContext(
        input_transforms=batch.input_transforms,
        target_transforms=batch.target_transforms,
        input_coord=batch.input_coord,
        target_coord=batch.target_coord,
    )
    if attn.is_gta:
        geom = decoder_reps(
            attn.gta,
            target_coord=batch.target_coord,
            target_transforms=batch.target_transforms,
            target_rays=(
                batch.target_rays.reshape(*batch.target_transforms.shape[:2], -1, 3)
                if attn.gta.ray_to_se3
                else None
            ),
            input_coord=batch.input_coord,
            input_transforms=batch.input_transforms,
            input_rays=(
                downsample_grid(batch.input_rays, 3).reshape(
                    *batch.input_rays.shape[:2], -1, 3
                )
                if attn.gta.ray_to_se3
                else None
            ),
            enc=enc_ctx.geom if enc_ctx is not None else None,
        )
        ctx = ctx.replace(geom=geom)
    elif attn.method in ("ape", "mln"):
        emb_q = posenc_2d_coord(180, batch.target_coord, (cfg.scale_h, cfg.scale_w))
        ctx = ctx.replace(
            target_coord_emb=emb_q,
            input_coord_emb=enc_ctx.input_coord_emb if enc_ctx is not None else None,
        )
    elif attn.method == "repast":
        ctx = ctx.replace(
            key_ray_emb=enc_ctx.key_ray_emb if enc_ctx is not None else None
        )
    elif attn.method == "gbt":
        # query rays vs input rays Plücker distance (decoder.py:222-227)
        pos = batch.target_camera_pos.reshape(batch.target_camera_pos.shape[0], -1, 3)
        rays = batch.target_rays.reshape(batch.target_rays.shape[0], -1, 3)
        pl_q = plucker_params(jnp.concatenate([pos, rays], -1))
        ctx = ctx.replace(plucker_dist=plucker_dist(pl_q, enc_ctx.gbt_ray_input))
    return ctx


class RayPredictor(nn.Module):
    """Query embedding + cross-attention transformer (decoder.py:27-136)."""

    cfg: DecoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,  # [B, K, z_dim] scene latent
        x: jnp.ndarray,  # [B, T, 3] query camera positions
        rays: jnp.ndarray,  # [B, T, 3] query ray directions
        ctx: AttnContext,
        deterministic: bool = True,
        queries: Optional[jnp.ndarray] = None,
    ):
        cfg = self.cfg
        B, T = rays.shape[0], rays.shape[1]

        if queries is not None:
            pass
        elif cfg.emb == "const":
            init_emb = self.param(
                "initial_emb", nn.initializers.normal(1.0), (cfg.dim,)
            ).astype(self.dtype)
            queries = jnp.broadcast_to(init_emb[None, None], (B, T, cfg.dim))
        else:
            if cfg.emb == "ray":
                queries = ray_posenc(x, rays, 15, cfg.pos_start_octave, 15)
            elif cfg.emb == "camera_planar":
                cam = ctx.target_transforms[:, :, :3].reshape(B, -1, 12)  # [B, Nt, 12]
                coord = ctx.target_coord  # [B, Nt, P, 2]
                emb = posenc_2d_coord(180, coord, (cfg.scale_h, cfg.scale_w))
                cam = jnp.broadcast_to(cam[:, :, None], (*coord.shape[:3], 12))
                queries = jnp.concatenate([emb, cam], -1).reshape(B, T, 192)
            elif cfg.emb == "planar":
                coord = ctx.target_coord
                queries = posenc_2d_coord(180, coord, (cfg.scale_h, cfg.scale_w)).reshape(
                    B, T, 180
                )
            else:
                raise NotImplementedError(cfg.emb)
            queries = queries.astype(self.dtype)
            # OSRT input MLP (decoder.py:70-77), always on in ImprovedSRTDecoder
            h = nn.Dense(360, dtype=self.dtype, name="input_mlp0", **srt_linear_init)(queries)
            h = nn.relu(h)
            queries = nn.Dense(cfg.dim, dtype=self.dtype, name="input_mlp1", **srt_linear_init)(h)

        return Transformer(
            dim=cfg.dim,
            depth=cfg.num_att_blocks,
            heads=cfg.heads,
            dim_head=cfg.head_dim,
            mlp_dim=cfg.ff_dim,
            dropout=cfg.dropout,
            kv_dim=cfg.z_dim,
            attn=cfg.attn,
            return_last_attmap=cfg.return_last_attmap,
            dtype=self.dtype,
            name="transformer",
        )(queries, z, ctx, deterministic)


_ACTS = {
    "relu": nn.relu,
    "lrelu": nn.leaky_relu,
    # exact erf GELU to match torch nn.GELU() (reference decoder.py:185-196)
    "gelu": lambda x: nn.gelu(x, approximate=False),
}


class SRTDecoder(nn.Module):
    """RayPredictor + render MLP (decoder.py:139-384)."""

    cfg: DecoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        x: jnp.ndarray,  # [B, T, 3]
        rays: jnp.ndarray,  # [B, T, 3]
        ctx: AttnContext,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, dict]:
        cfg = self.cfg
        if cfg.attn.method == "repast":
            # Express query rays in every key view's frame (decoder.py:206-220);
            # queries become [B, T, Nk, 3] and stay per-view through attention.
            tfs = ctx.input_transforms  # [B, Nk, 4, 4]
            B, T = x.shape[0], x.shape[1]
            Nk = tfs.shape[1]
            xe = jnp.broadcast_to(x[:, None], (B, Nk, T, 3))
            re = jnp.broadcast_to(rays[:, None], (B, Nk, T, 3))
            x = jnp.swapaxes(rigid_transform(tfs, xe, 1.0), 1, 2)
            rays = jnp.swapaxes(rigid_transform(tfs, re, 0.0), 1, 2)
        elif cfg.attn.method == "gbt":
            # Queries are the Plücker parameters themselves (decoder.py:222-227)
            pl = plucker_params(jnp.concatenate([x, rays], -1))
            x, rays = jnp.split(pl, 2, -1)

        queries = None
        if cfg.attn.method == "frustum_posemb":
            # Frustum-point query embedding (decoder.py:229-245)
            p3d = frustum_pixel_points(
                ctx.target_coord,
                se3_inverse(ctx.target_transforms),
                cfg.attn.frustum_D,
                dmin=cfg.attn.frustum_dmin,
                dmax=cfg.attn.frustum_dmax,
            )  # [B, Nt, P, D*4]
            if cfg.attn.frustum_normalize:
                p3d = 0.01 * p3d
            if cfg.attn.frustum_fourier:
                p3d = plucker_posenc(p3d, cfg.attn.frustum_freqs)
            h = nn.Dense(cfg.dim * 2, dtype=self.dtype, name="frustum_phi0")(
                p3d.astype(self.dtype)
            )
            h = nn.relu(h)
            emb = nn.Dense(cfg.dim, dtype=self.dtype, name="frustum_phi1")(h)
            queries = emb.reshape(emb.shape[0], -1, cfg.dim)

        out = RayPredictor(cfg, dtype=self.dtype, name="allocation_transformer")(
            z, x, rays, ctx, deterministic, queries=queries
        )
        ret = {}
        if cfg.return_last_attmap:
            out, attmap = out
            ret["masks"] = attmap[:, 0]  # heads == 1 asserted by config

        if cfg.attn.method == "repast":
            out = jnp.mean(out, 2)  # average over key views [B, T, Nk, C]

        act = _ACTS[cfg.act]
        h = out
        for i in range(4):
            h = nn.Dense(cfg.rmlp_dim, dtype=self.dtype, name=f"render_mlp{i}", **srt_linear_init)(h)
            h = act(h)
        h = nn.Dense(3, dtype=self.dtype, name="render_mlp_out", **srt_linear_init)(h)
        pixels = nn.sigmoid(h) if cfg.sigmoid else h
        return pixels.astype(jnp.float32), ret
