"""Cross-validate the pure-JAX SSIM against an independent implementation.

The reference computes SSIM with pytorch_msssim (evaluate.py:21,140), which
follows Wang et al. with an 11x11 sigma=1.5 Gaussian window — the same
formulation tf.image.ssim implements (filter_size=11, filter_sigma=1.5).
pytorch_msssim is absent from this environment, so TF is the independent
golden: agreement here plus both libraries following the same published
formulation ties our metric to the reference protocol.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gta_tpu.utils.metrics import mse2psnr, ssim

tf = pytest.importorskip("tensorflow")


def _tf_ssim(a, b):
    return float(
        tf.reduce_mean(
            tf.image.ssim(
                tf.constant(a), tf.constant(b), max_val=1.0,
                filter_size=11, filter_sigma=1.5, k1=0.01, k2=0.03,
            )
        )
    )


def _pairs():
    rng = np.random.RandomState(0)
    clean = rng.rand(2, 48, 64, 3).astype(np.float32)
    noisy = np.clip(clean + rng.normal(scale=0.08, size=clean.shape), 0, 1).astype(
        np.float32
    )
    smooth = np.broadcast_to(
        np.linspace(0, 1, 64, dtype=np.float32)[None, None, :, None], clean.shape
    ).copy()
    smooth_shift = np.clip(smooth + 0.05, 0, 1).astype(np.float32)
    blur = clean.copy()
    blur[:, 1:] = 0.5 * (blur[:, 1:] + blur[:, :-1])
    return [(clean, noisy), (smooth, smooth_shift), (clean, blur), (clean, clean)]


@pytest.mark.parametrize("idx", range(4))
def test_ssim_matches_tf_golden(idx):
    a, b = _pairs()[idx]
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    golden = _tf_ssim(a, b)
    assert abs(ours - golden) < 2e-3, (ours, golden)


def test_psnr_definition():
    # PSNR = -10 log10(MSE), the reference common.py:14-15 definition
    assert abs(float(mse2psnr(jnp.asarray(0.01))) - 20.0) < 1e-5
    assert abs(float(mse2psnr(jnp.asarray(1.0))) - 0.0) < 1e-5
