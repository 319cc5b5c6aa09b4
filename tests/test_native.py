"""Native C++ renderer: builds, matches the numpy reference, and is faster."""

import time

import numpy as np
import pytest

from gta_tpu.config import DataConfig
from gta_tpu.data.native import get_lib, render_views
from gta_tpu.data.synthetic import SyntheticScenes

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no native toolchain")


def _cfg():
    return DataConfig(dataset="synthetic", num_points=64, height=60, width=80,
                      downsample=0, downsample_input_coord=2,
                      num_input_views=2, num_target_views=2, num_views=4)


def test_native_matches_numpy():
    cfg = _cfg()
    a = SyntheticScenes(cfg, "train", use_native=True)[5]
    b = SyntheticScenes(cfg, "train", use_native=False)[5]
    rays_err = np.abs(a["input_rays"] - b["input_rays"]).max()
    assert rays_err < 1e-4, rays_err  # fp32 vs fp64 ray normalization
    # images: identical except possible sphere-silhouette boundary pixels
    diff = np.abs(a["input_images"] - b["input_images"]).max(-1)
    frac_close = float((diff < 1e-3).mean())
    assert frac_close > 0.995, frac_close
    np.testing.assert_allclose(a["input_transforms"], b["input_transforms"], atol=1e-6)


def test_native_deterministic():
    cfg = _cfg()
    a = SyntheticScenes(cfg, "train", use_native=True)[3]
    b = SyntheticScenes(cfg, "train", use_native=True)[3]
    np.testing.assert_array_equal(a["input_images"], b["input_images"])


def test_native_faster_at_scale():
    rng = np.random.RandomState(0)
    K, NV, H, W = 6, 5, 240, 320
    centers = rng.uniform(-3, 3, (K, 3)).astype(np.float32)
    radii = rng.uniform(0.4, 1.1, K).astype(np.float32)
    colors = rng.rand(K, 3).astype(np.float32)
    pos = rng.uniform(5, 8, (NV, 3)).astype(np.float32)
    from gta_tpu.geometry.rays import lookat_extrinsic

    ext = np.stack([lookat_extrinsic(p) for p in pos])

    t0 = time.perf_counter()
    out = render_views(pos, ext, centers, radii, colors, H, W)
    native_t = time.perf_counter() - t0
    assert out is not None
    imgs, rays = out
    assert imgs.shape == (NV, H, W, 3)
    assert np.isfinite(imgs).all() and np.isfinite(rays).all()
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-5)
    # loose wall-clock sanity only — the suite runs tests concurrently and
    # CPU contention makes tight timing asserts flaky
    assert native_t < 5.0, native_t


def test_native_png_decode_rgb_and_gray(tmp_path):
    """Native batch PNG decode matches an independent decoder bit-exactly."""
    import cv2

    from gta_tpu.data.native import decode_pngs_gray, decode_pngs_rgb

    rng = np.random.RandomState(7)
    h, w, n = 24, 32, 5
    rgb_paths, gray_paths, rgb_ref, gray_ref = [], [], [], []
    for i in range(n):
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        p = str(tmp_path / f"img{i}.png")
        cv2.imwrite(p, img[..., ::-1])  # cv2 writes BGR
        rgb_paths.append(p)
        rgb_ref.append(img)
        m = rng.randint(0, 7, (h, w)).astype(np.uint8)
        pm = str(tmp_path / f"mask{i}.png")
        cv2.imwrite(pm, m)
        gray_paths.append(pm)
        gray_ref.append(m)

    out = decode_pngs_rgb(rgb_paths, h, w)
    if out is None:
        pytest.skip("libpng decode unavailable")
    np.testing.assert_allclose(out, np.stack(rgb_ref).astype(np.float32) / 255.0, atol=1e-7)

    masks = decode_pngs_gray(gray_paths, h, w)
    assert masks is not None
    np.testing.assert_array_equal(masks, np.stack(gray_ref))


def test_native_png_decode_failure_returns_none(tmp_path):
    from gta_tpu.data.native import decode_pngs_rgb

    if decode_pngs_rgb([], 4, 4) is None:
        pytest.skip("libpng decode unavailable")
    assert decode_pngs_rgb([str(tmp_path / "missing.png")], 4, 4) is None
