"""Device-side synthetic generator: renderer parity vs the numpy pipeline,
geometry self-consistency, and trainability of its batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gta_tpu.config import DataConfig
from gta_tpu.data import synthetic as host_synth
from gta_tpu.data.device_synth import (
    DeviceSynthetic,
    inv_se3,
    lookat_extrinsic_jax,
    render_spheres,
    _pixel_dirs,
)
from gta_tpu.geometry.rays import camera_rays_from_extrinsic, lookat_extrinsic


def _cfg(**kw):
    base = dict(
        dataset="synthetic",
        downsample=1,
        num_input_views=2,
        num_target_views=3,
        num_points=2560,
        return_transform=True,
    )
    base.update(kw)
    return DataConfig(**base)


def test_renderer_matches_numpy_reference():
    """Same spheres + camera => same image as data/synthetic._render."""
    rng = np.random.RandomState(3)
    centers = rng.uniform(-2, 2, (4, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(0.3, 1.8, 4)
    radii = rng.uniform(0.4, 1.1, 4).astype(np.float32)
    colors = rng.uniform(0.1, 1.0, (4, 3)).astype(np.float32)
    cam = np.array([6.0, -4.0, 5.0], np.float32)
    ext = lookat_extrinsic(cam)
    rays = camera_rays_from_extrinsic(ext, cam, 40, 30)

    ref = host_synth._render(cam, rays, (centers, radii, colors))
    # pad with radius-0 spheres the way the device path masks inactive ones
    c6 = np.concatenate([centers, np.zeros((2, 3), np.float32)])
    r6 = np.concatenate([radii, np.zeros(2, np.float32)])
    col6 = np.concatenate([colors, np.zeros((2, 3), np.float32)])
    got = np.asarray(
        render_spheres(jnp.asarray(cam), jnp.asarray(rays), jnp.asarray(c6),
                       jnp.asarray(r6), jnp.asarray(col6))
    )
    assert np.max(np.abs(got - ref)) < 2e-5


def test_lookat_and_pixel_dirs_match_numpy():
    cam = np.array([[7.0, 1.0, 4.0], [-3.0, 5.0, 6.0]], np.float32)
    ext_j = np.asarray(lookat_extrinsic_jax(jnp.asarray(cam)))
    for i in range(2):
        np.testing.assert_allclose(ext_j[i], lookat_extrinsic(cam[i]), atol=1e-5)
    # ray grid via constant pixel dirs == reference per-extrinsic builder
    dirs = np.asarray(_pixel_dirs(24, 32))
    rays = np.einsum("hwc,ck->hwk", dirs, ext_j[0, :3, :3])
    ref = camera_rays_from_extrinsic(ext_j[0], cam[0], 32, 24)
    np.testing.assert_allclose(rays, ref, atol=1e-5)


def test_inv_se3():
    rng = np.random.RandomState(0)
    cam = rng.uniform(-5, 5, (8, 3)).astype(np.float32)
    ext = np.asarray(lookat_extrinsic_jax(jnp.asarray(cam)))
    inv = np.asarray(inv_se3(jnp.asarray(ext)))
    eye = np.einsum("bij,bjk->bik", ext, inv)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)


def test_geometry_self_consistency():
    """input_tf must map canonical-frame camera positions back to each view's
    camera frame origin: ext_i = input_tf_i @ canon (transform mode)."""
    gen = DeviceSynthetic(_cfg(), "train", seed=1)
    b = gen.batch(0, 3)
    tf = np.asarray(b.input_transforms)  # [B, N, 4, 4] = ext_i @ inv(canon)
    canon = np.asarray(b.transform)
    pos = np.asarray(b.input_camera_pos)  # canonical-frame positions
    # ext_i = tf_i @ canon; applying ext_i to the *world* camera pos gives 0.
    # canonical pos = canon @ world pos => world pos = inv(canon) @ pos_c.
    for bi in range(3):
        inv_canon = np.linalg.inv(canon[bi])
        for v in range(tf.shape[1]):
            world = inv_canon @ np.append(pos[bi, v], 1.0)
            ext = tf[bi, v] @ canon[bi]
            origin = ext @ world
            assert np.allclose(origin[:3], 0.0, atol=1e-4)


def test_target_pixels_come_from_rendered_frames():
    """Every sampled target pixel must equal the rendered full frame at its
    coordinate (checks the on-device gather against a full-scale render)."""
    cfg = _cfg()
    gen = DeviceSynthetic(cfg, "val", seed=2)
    full = DeviceSynthetic(cfg, "val", seed=2, full_scale=True)
    b = gen.batch(0, 2)
    bf = full.batch(0, 2)
    h = w = None
    H, W = gen.h, gen.w
    coord = np.asarray(b.target_coord)  # [B, NT, ppv, 2] in [0,1)
    pix = np.asarray(b.target_pixels)
    frames = np.asarray(bf.target_pixels).reshape(2, cfg.num_target_views, H, W, 3)
    # make_2dcoord: coord[i, j] = (i/h, j/w)
    iy = np.round(coord[..., 0] * H).astype(int)
    ix = np.round(coord[..., 1] * W).astype(int)
    for bi in range(2):
        for v in range(cfg.num_target_views):
            got = frames[bi, v, iy[bi, v], ix[bi, v]]
            np.testing.assert_allclose(got, pix[bi, v], atol=1e-6)


def test_val_ids_disjoint_from_train():
    tr = DeviceSynthetic(_cfg(), "train", seed=0)
    va = DeviceSynthetic(_cfg(), "val", seed=0)
    bt, bv = tr.batch(0, 4), va.batch(0, 4)
    assert set(np.asarray(bt.sceneid)).isdisjoint(set(np.asarray(bv.sceneid)))
    assert not np.allclose(np.asarray(bt.input_images), np.asarray(bv.input_images))


def test_train_step_on_device_batch():
    """The flagship trainer consumes device-generated batches directly."""
    from gta_tpu.config import load_config
    from gta_tpu.train.trainer import Trainer

    cfg = load_config("runs/clevrtr/GTA/gta/config.yaml")
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, height=32, width=32, num_points=64),
    )
    gen = DeviceSynthetic(cfg.data, "train", seed=0)
    tr = Trainer(cfg)
    batch = gen.batch(0, 2)
    state = tr.init_state(batch)
    state, m = tr.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
