"""Device-resident synthetic scene generation — zero host->device traffic.

The host synthetic pipeline (data/synthetic.py) renders scenes in numpy and
ships ~30 MB per batch to the device. On a tunneled/bandwidth-limited TPU
(measured ~5.5 MB/s here) that caps training at ~0.4 steps/s regardless of
compute. This module is the TPU-native answer: the whole scene pipeline —
sphere sampling, camera placement, ray-traced rendering, canonicalization,
pixel sampling (reference clevr_tr.py:234-327 semantics) — runs *on device*
inside one jit, so a training step consumes freshly generated scenes with
zero steady-state transfers and no host involvement.

Scene distribution matches data/synthetic.py (same sphere/camera/shading
parameters); per-scene determinism comes from folding the scene id into the
dataset key, so batches are reproducible and val scenes are a fixed held-out
id range exactly like the host dataset's seed_base split.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gta_tpu.config import DataConfig
from gta_tpu.geometry.coords import make_2dcoord
from gta_tpu.models.context import SceneBatch
from gta_tpu.data.sampling import points_per_view

MAX_SPHERES = 6


def lookat_extrinsic_jax(camera_pos: jnp.ndarray) -> jnp.ndarray:
    """World->camera extrinsic [..., 4, 4] for level cameras looking at the
    origin (JAX port of geometry/rays.lookat_extrinsic, reference nerf.py:7-53)."""
    z = -camera_pos
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    vertical = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], camera_pos.dtype), z.shape)
    x = jnp.cross(z, vertical)
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = jnp.cross(z, x)
    R = jnp.stack((x, y, z), -2)  # rows: right, down-y, forward
    t = -jnp.einsum("...ij,...j->...i", R, camera_pos)
    mat = jnp.concatenate((R, t[..., None]), -1)
    bottom = jnp.zeros_like(mat[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate((mat, bottom), -2)


def inv_se3(mat: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of [..., 4, 4] rigid transforms (R^T, -R^T t)."""
    R = mat[..., :3, :3]
    t = mat[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    out = jnp.zeros_like(mat).at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    return out.at[..., 3, 3].set(1.0)


def _pixel_dirs(h: int, w: int, focal: float = 0.035, sensor_width: float = 0.032):
    """Constant camera-frame pixel direction grid [H, W, 3], unit norm.

    Matches geometry/rays.camera_rays_from_extrinsic pixel centers: world
    rays are then d @ R (R = extrinsic rotation rows right/down-y/forward)."""
    sensor_height = (sensor_width / w) * h
    hb = np.linspace(-1, 1, w + 1) * sensor_width / 2
    vb = np.linspace(-1, 1, h + 1) * sensor_height / 2
    h_off = (hb[:-1] + hb[1:]) / 2
    v_off = (vb[:-1] + vb[1:]) / 2
    hh, vv = np.meshgrid(h_off, v_off)  # [H, W]
    d = np.stack([hh, vv, np.full_like(hh, focal)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(d, jnp.float32)


def render_spheres(camera_pos, rays, centers, radii, colors):
    """Ray-trace shaded spheres on a gradient background (JAX port of
    data/synthetic._render; radius-0 spheres never hit => mask padding).

    camera_pos [3], rays [H, W, 3], centers [K, 3], radii [K], colors [K, 3].
    """
    oc = (camera_pos[None] - centers)[:, None, None, :]  # [K, 1, 1, 3]
    d = rays[None]
    b = jnp.sum(oc * d, -1)  # [K, H, W]
    c = jnp.sum(oc * oc, -1) - radii[:, None, None] ** 2
    disc = b * b - c
    hit = disc > 0
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    t = jnp.where(hit & (t > 1e-3), t, jnp.inf)
    k_near = jnp.argmin(t, 0)  # [H, W]
    t_near = jnp.min(t, 0)
    hit_any = jnp.isfinite(t_near)

    t_fin = jnp.where(hit_any, t_near, 1.0)
    p = camera_pos[None, None] + rays * t_fin[..., None]
    # One-hot contraction instead of centers[k_near]/colors[k_near]: per-pixel
    # integer gathers serialize through scalar memory on TPU (measured
    # 2 x 17.5 ms/step at batch 32 — scripts/profile_ops.py), while the
    # [H*W, K] x [K, 3] contraction rides the vector units.
    oh = jax.nn.one_hot(k_near, centers.shape[0], dtype=rays.dtype)  # [H, W, K]
    n = p - jnp.einsum("hwk,kc->hwc", oh, centers)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    light = jnp.asarray([0.4, 0.3, 0.85])
    light = light / jnp.linalg.norm(light)
    shade = 0.35 + 0.65 * jnp.clip(jnp.sum(n * light, -1), 0.0, 1.0)
    obj = jnp.einsum("hwk,kc->hwc", oh, colors) * shade[..., None]

    bg = 0.5 + 0.4 * rays[..., 2:3] * jnp.asarray([0.6, 0.7, 1.0])[None, None]
    img = jnp.where(hit_any[..., None], obj, bg)
    return jnp.clip(img, 0.0, 1.0).astype(jnp.float32)


class DeviceSynthetic:
    """jit-compiled batch generator mirroring SyntheticScenes' batch layout.

    Usage:
        gen = DeviceSynthetic(cfg.data, mode="train", seed=cfg.seed)
        batch = gen.batch(step, batch_size)     # compiled once per batch size
    Train mode streams infinite fresh scenes (ids advance with step); val and
    test modes draw from fixed disjoint id ranges for reproducible eval.
    """

    def __init__(self, cfg: DataConfig, mode: str = "train", seed: int = 0,
                 full_scale: bool = False):
        self.cfg = cfg
        self.mode = mode
        self.full_scale = full_scale
        base = {"train": 0, "val": 1 << 20, "test": 1 << 21}[mode]
        self.id_base = base
        self.key = jax.random.PRNGKey(seed * (1 << 22) + base + 17)
        ds = cfg.downsample
        self.h = cfg.height // (2**ds) if ds else cfg.height
        self.w = cfg.width // (2**ds) if ds else cfg.width
        self.dirs = _pixel_dirs(self.h, self.w)
        self.coord = jnp.asarray(make_2dcoord(self.h, self.w).reshape(-1, 2))
        stride = 2**cfg.downsample_input_coord
        coord2d = make_2dcoord(self.h, self.w)
        self.input_coord_ds = jnp.asarray(
            coord2d[stride // 2 :: stride, stride // 2 :: stride].reshape(-1, 2)
        )
        self._gen = jax.jit(
            jax.vmap(self._gen_one), static_argnums=()
        )

    # -- per-scene generation (vmapped over the batch) ---------------------
    def _gen_one(self, sid: jnp.ndarray):
        cfg = self.cfg
        NV, NI, NT = cfg.num_views, cfg.num_input_views, cfg.num_target_views
        key = jax.random.fold_in(self.key, sid)
        ks = jax.random.split(key, 10)

        n = jax.random.randint(ks[0], (), 3, 7)
        lo = jnp.asarray([-3.0, -3.0, 0.3])
        hi = jnp.asarray([3.0, 3.0, 1.8])
        centers = jax.random.uniform(ks[1], (MAX_SPHERES, 3)) * (hi - lo) + lo
        radii = jax.random.uniform(ks[2], (MAX_SPHERES,), minval=0.4, maxval=1.1)
        radii = jnp.where(jnp.arange(MAX_SPHERES) < n, radii, 0.0)
        colors = jax.random.uniform(ks[3], (MAX_SPHERES, 3), minval=0.1, maxval=1.0)

        az = jax.random.uniform(ks[4], (NV,), minval=0.0, maxval=2 * jnp.pi)
        el = jax.random.uniform(ks[5], (NV,), minval=0.25, maxval=0.9)
        r = jax.random.uniform(ks[6], (NV,), minval=7.0, maxval=10.0)
        cam_pos = jnp.stack(
            [r * jnp.cos(az) * jnp.cos(el), r * jnp.sin(az) * jnp.cos(el), r * jnp.sin(el)],
            -1,
        )
        ext = lookat_extrinsic_jax(cam_pos)  # [NV, 4, 4]
        # world rays: d_cam @ R rows (right, down-y, forward)
        all_rays = jnp.einsum("hwc,vck->vhwk", self.dirs, ext[:, :3, :3])
        imgs = jax.vmap(render_spheres, in_axes=(0, 0, None, None, None))(
            cam_pos, all_rays, centers, radii, colors
        )  # [NV, H, W, 3]

        perm = jax.random.permutation(ks[7], NV)
        input_idx = perm[:NI]
        if cfg.reconstruction:
            target_idx = input_idx[:NT]
        elif cfg.overlap:
            target_idx = jax.random.permutation(ks[8], NV)[:NT]
        else:
            target_idx = perm[NI : NI + NT]

        canon = ext[input_idx[0]]
        if cfg.avoid_zerocamorg:
            canon = canon.at[:3, 3].add(0.01)
        if cfg.canonical_view:
            Rc = canon[:3, :3]
            rays_c = jnp.einsum("ij,vhwj->vhwi", Rc, all_rays)
            pos_c = jnp.einsum("ij,vj->vi", Rc, cam_pos) + canon[:3, 3]
            inv_canon = inv_se3(canon)
            input_tf = jnp.einsum("vij,jk->vik", ext[input_idx], inv_canon)
            target_tf = jnp.einsum("vij,jk->vik", ext[target_idx], inv_canon)
        else:
            rays_c, pos_c = all_rays, cam_pos
            input_tf = ext[input_idx]
            target_tf = ext[target_idx]

        HW = self.h * self.w
        out = {
            "input_images": imgs[input_idx],
            "input_camera_pos": pos_c[input_idx],
            "input_rays": rays_c[input_idx],
            "input_transforms": input_tf,
            "transform": canon,
            "sceneid": sid.astype(jnp.int32),
        }

        if not cfg.return_transform:
            # non-transform mode (clevr_tr.py:313-327): actual target rays
            t_rays = rays_c[target_idx].reshape(-1, 3)
            t_pos = jnp.repeat(pos_c[target_idx], HW, 0)
            t_pix = imgs[target_idx].reshape(-1, 3)
            if not self.full_scale:
                sel = jax.random.choice(
                    ks[9], NT * HW, (cfg.num_points,), replace=False
                )
                t_pix, t_rays, t_pos = t_pix[sel], t_rays[sel], t_pos[sel]
            out.update(
                target_pixels=t_pix, target_camera_pos=t_pos, target_rays=t_rays
            )
            return out

        # transform mode: canonical view-0 ray grid everywhere; the relative
        # transform carries the view change (clevr_tr.py:275-311)
        base_rays = rays_c[input_idx[0]].reshape(-1, 3)
        base_pos = jnp.broadcast_to(pos_c[input_idx[0]], (HW, 3))
        tgt_imgs = imgs[target_idx].reshape(NT, HW, 3)
        if not self.full_scale:
            ppv = points_per_view(cfg.num_points, NT)
            sel = jax.vmap(
                lambda k: jax.random.choice(k, HW, (ppv,), replace=HW < ppv)
            )(jax.random.split(ks[9], NT))  # [NT, ppv]
            target_pixels = jnp.take_along_axis(tgt_imgs, sel[..., None], 1)
            target_rays = base_rays[sel]
            target_camera_pos = base_pos[sel]
            target_coord = self.coord[sel]
        else:
            target_pixels = tgt_imgs
            target_rays = jnp.broadcast_to(base_rays, (NT, HW, 3))
            target_camera_pos = jnp.broadcast_to(base_pos, (NT, HW, 3))
            target_coord = jnp.broadcast_to(self.coord, (NT, HW, 2))

        out.update(
            target_pixels=target_pixels,
            target_camera_pos=target_camera_pos,
            target_rays=target_rays,
            target_transforms=target_tf,
            input_coord=jnp.broadcast_to(
                self.input_coord_ds, (cfg.num_input_views, *self.input_coord_ds.shape)
            ),
            target_coord=target_coord,
        )
        return out

    # ----------------------------------------------------------------------
    def batch(
        self, step: int, batch_size: int, shard_index: int = 0, shard_count: int = 1
    ) -> SceneBatch:
        """Generate batch `step` (train: fresh ids forever; val/test: cycle a
        fixed id range so evaluation sees the same scenes every time).
        shard_index/shard_count give multi-host runs disjoint id streams
        (the analogue of the loader's per-host shard)."""
        if self.mode == "train":
            start = (step * shard_count + shard_index) * batch_size
        else:
            start = ((step * shard_count + shard_index) * batch_size) % (1 << 18)
        ids = jnp.arange(start, start + batch_size) + self.id_base
        return SceneBatch(**self._gen(ids))

    def val_batches(self, num_scenes: int, batch_size: int):
        """Fixed deterministic eval set as a list of device-resident batches."""
        n = max(1, num_scenes // batch_size)
        return [self.batch(i, batch_size) for i in range(n)]
