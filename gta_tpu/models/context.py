"""Explicit pytrees replacing the reference's mutable `extras` dict bus.

`SceneBatch` is the canonical batch layout every data pipeline produces
(mirrors the reference batch dict, trainer.py:87-102, in NHWC). `AttnContext`
carries per-batch geometry through the model functionally — precomputed
GeomReps plus method-specific side tables.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from gta_tpu.ops.reps import GeomReps


@struct.dataclass
class SceneBatch:
    """One training/eval batch. B batch, N input views, Nt target views,
    P target points per view, H/W input resolution, T' patch tokens/view."""

    input_images: jnp.ndarray  # [B, N, H, W, 3]
    input_camera_pos: jnp.ndarray  # [B, N, 3]
    input_rays: jnp.ndarray  # [B, N, H, W, 3]
    target_pixels: jnp.ndarray  # [B, Nt, P, 3]
    target_camera_pos: jnp.ndarray  # [B, Nt, P, 3]
    target_rays: jnp.ndarray  # [B, Nt, P, 3]
    input_transforms: Optional[jnp.ndarray] = None  # [B, N, 4, 4]
    target_transforms: Optional[jnp.ndarray] = None  # [B, Nt, 4, 4]
    input_coord: Optional[jnp.ndarray] = None  # [B, N, T', 2]
    target_coord: Optional[jnp.ndarray] = None  # [B, Nt, P, 2]
    transform: Optional[jnp.ndarray] = None  # [B, 4, 4] canonical extrinsic
    sceneid: Optional[jnp.ndarray] = None  # [B]
    # pre-downsample extras (reference clevr_tr.py:261,329) — item-level
    # passthrough requested via return_org_rays / return_org_images
    input_org_rays: Optional[jnp.ndarray] = None  # [B, N, H0, W0, 3]
    org_input_images: Optional[jnp.ndarray] = None  # [B, N, H0, W0, 3]


@struct.dataclass
class AttnContext:
    """Geometry context threaded through attention layers (jit-friendly).

    geom holds the group-rep tables; the rest are method-specific extras
    (reference encoder.py:122-181, layers.py:348-385, decoder.py:355-371).
    """

    geom: GeomReps = GeomReps()
    # camera transforms (for ape/mln/camera_planar/ftl)
    input_transforms: Optional[jnp.ndarray] = None  # [B, N, 4, 4]
    target_transforms: Optional[jnp.ndarray] = None  # [B, Nt, 4, 4]
    # 2D coord embeddings (ape/mln)
    input_coord_emb: Optional[jnp.ndarray] = None  # [B, N, T', E]
    target_coord_emb: Optional[jnp.ndarray] = None  # [B, Nt, P, E]
    # patch/pixel coords (frustum_posemb and friends)
    input_coord: Optional[jnp.ndarray] = None  # [B, N, T', 2]
    target_coord: Optional[jnp.ndarray] = None  # [B, Nt, P, 2]
    # GBT Plücker-distance bias + late-fusion ray embedding
    plucker_dist: Optional[jnp.ndarray] = None  # [B, Tq, Tk]
    gbt_ray_emb: Optional[jnp.ndarray] = None  # [B, T, E]
    gbt_ray_input: Optional[jnp.ndarray] = None  # [B, Tk, 6] input Plücker rays
    # RePAST per-view ray embeddings
    key_ray_emb: Optional[jnp.ndarray] = None  # [B, Nk, Lk, E]
    query_ray_emb: Optional[jnp.ndarray] = None  # [B, Tq, Nk, E]
