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
