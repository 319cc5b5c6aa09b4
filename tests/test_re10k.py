"""RealEstate10K/ACID loader: format parsing, geometry, and trainability
against a synthesized on-disk fixture (no real dump needed)."""

import dataclasses
import os

import numpy as np
import pytest

from gta_tpu.config import DataConfig, load_config
from gta_tpu.data.re10k import (
    RealEstate10K,
    camera_center,
    normalize_scene_scale,
    parse_camera_file,
    rays_from_intrinsics,
)

N_FRAMES = 40


def _make_dump(root, n_videos=2, split="train"):
    """Write a tiny RealEstate10K-format dump: smooth dolly trajectories,
    frames rendered as flat color gradients keyed by frame index."""
    import cv2

    split_dir = os.path.join(root, split)
    for vid in range(n_videos):
        vdir = os.path.join(split_dir, "frames", f"vid{vid}")
        os.makedirs(vdir, exist_ok=True)
        lines = [f"https://example.com/watch?v=vid{vid}"]
        for i in range(N_FRAMES):
            ts = 1000 * i
            ang = 0.01 * i
            R = np.asarray(
                [
                    [np.cos(ang), 0, np.sin(ang)],
                    [0, 1, 0],
                    [-np.sin(ang), 0, np.cos(ang)],
                ]
            )
            c = np.asarray([0.05 * i, 0.01 * vid, -0.02 * i])  # camera center
            t = -R @ c
            pose = np.concatenate([R, t[:, None]], 1).reshape(-1)
            fx, fy, cx, cy = 0.9, 1.2, 0.5, 0.5
            nums = [fx, fy, cx, cy, 0.0, 0.0] + pose.tolist()
            lines.append(str(ts) + " " + " ".join(f"{v:.9f}" for v in nums))
            img = np.zeros((24, 32, 3), np.uint8)
            img[..., 0] = int(255 * i / N_FRAMES)
            img[..., 1] = np.linspace(0, 255, 32, dtype=np.uint8)[None]
            cv2.imwrite(os.path.join(vdir, f"{ts}.png"), img)
        with open(os.path.join(split_dir, f"vid{vid}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return root


def _cfg(path, **kw):
    base = dict(
        dataset="re10k",
        path=path,
        num_points=64,
        num_input_views=2,
        num_target_views=2,
        height=24,
        width=32,
        downsample_input_coord=2,
        return_transform=True,
    )
    base.update(kw)
    return DataConfig(**base)


@pytest.fixture(scope="module")
def dump(tmp_path_factory):
    return _make_dump(str(tmp_path_factory.mktemp("re10k")))


def test_parse_camera_file(dump):
    ts, intr, ext = parse_camera_file(os.path.join(dump, "train", "vid0.txt"))
    assert len(ts) == N_FRAMES and ts[1] == 1000
    np.testing.assert_allclose(intr[0], [0.9, 1.2, 0.5, 0.5])
    # rotation block orthonormal, bottom row homogeneous
    R = ext[3, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(
        ext[:, 3], np.tile([0.0, 0.0, 0.0, 1.0], (len(ts), 1)), atol=1e-12
    )
    # camera center recovers the generating trajectory
    np.testing.assert_allclose(camera_center(ext[10]), [0.5, 0.0, -0.2], atol=1e-5)


def test_rays_point_forward_and_unit(dump):
    _, intr, ext = parse_camera_file(os.path.join(dump, "train", "vid0.txt"))
    rays = rays_from_intrinsics(ext[0], intr[0], 32, 24)
    assert rays.shape == (24, 32, 3)
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-5)
    # principal ray == camera forward axis (z row of the extrinsic)
    center = rays[12, 16]
    fwd = ext[0, 2, :3]
    assert np.dot(center, fwd) > 0.999


def test_normalize_scene_scale(dump):
    _, _, ext = parse_camera_file(os.path.join(dump, "train", "vid0.txt"))
    out = normalize_scene_scale(ext, 0, 20)
    d = np.linalg.norm(camera_center(out[20]) - camera_center(out[0]))
    np.testing.assert_allclose(d, 1.0, atol=1e-5)


def test_item_layout_and_canonicalization(dump):
    ds = RealEstate10K(_cfg(dump), "train", min_gap=5, max_gap=10)
    item = ds[0]
    assert item["input_images"].shape == (2, 24, 32, 3)
    assert item["input_rays"].shape == (2, 24, 32, 3)
    assert item["target_pixels"].shape == (2, 32, 3)
    assert item["target_transforms"].shape == (2, 4, 4)
    # first context view is the canonical frame: identity relative transform
    np.testing.assert_allclose(item["input_transforms"][0], np.eye(4), atol=1e-5)
    # unit baseline after normalization
    d = np.linalg.norm(item["input_camera_pos"][1] - item["input_camera_pos"][0])
    np.testing.assert_allclose(d, 1.0, atol=1e-4)


def test_non_transform_mode(dump):
    ds = RealEstate10K(
        _cfg(dump, return_transform=False), "train", min_gap=5, max_gap=10
    )
    item = ds[0]
    assert item["target_pixels"].shape == (64, 3)
    assert item["target_rays"].shape == (64, 3)
    assert "target_transforms" not in item


def test_val_split_disjoint(dump):
    # with 2 videos, train gets vid0 and val gets vid1 (90/10-style split)
    tr = RealEstate10K(_cfg(dump), "train")
    va = RealEstate10K(_cfg(dump), "val")
    assert len(tr) == 1 and len(va) == 1
    assert tr.camera_paths != va.camera_paths


def test_train_step_on_re10k_config(dump):
    """The flagship re10k GTA config trains on fixture data end to end."""
    import jax

    from gta_tpu.data.loader import Loader
    from gta_tpu.data.registry import get_dataset
    from gta_tpu.train.trainer import Trainer

    cfg = load_config("runs/re10k/GTA/gta/config.yaml")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, path=dump, height=24, width=32, downsample=0, num_points=64
        ),
    )
    ds = get_dataset("train", cfg.data, seed=0)
    ds.min_gap, ds.max_gap = 5, 10
    batch = next(iter(Loader(ds, 1, shuffle=False, num_workers=0)))
    tr = Trainer(cfg)
    state = tr.init_state(batch)
    state, m = tr.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
