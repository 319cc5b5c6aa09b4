"""Image quality metrics: PSNR, SSIM (pure JAX), LPIPS (gated).

PSNR matches reference common.py:14-15; SSIM follows the standard Wang et
al. formulation with an 11x11 Gaussian window (the reference uses
pytorch_msssim, evaluate.py:21,140). LPIPS requires pretrained VGG/Alex
weights — gated behind an optional torch import (zero-egress environments
won't have the weights; evaluate falls back to PSNR/SSIM only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return mse2psnr(jnp.mean((pred - target) ** 2))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over [B, H, W, C] images (per-channel window statistics)."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kern = jnp.asarray(_gaussian_kernel(window_size, sigma))[:, :, None, None]

    def filt(x):
        # depthwise conv: apply the same window per channel
        C = x.shape[-1]
        k = jnp.tile(kern, (1, 1, 1, C))
        return jax.lax.conv_general_dilated(
            x,
            k,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    mu_p = filt(pred)
    mu_t = filt(target)
    mu_pp = filt(pred * pred) - mu_p**2
    mu_tt = filt(target * target) - mu_t**2
    mu_pt = filt(pred * target) - mu_p * mu_t
    num = (2 * mu_p * mu_t + c1) * (2 * mu_pt + c2)
    den = (mu_p**2 + mu_t**2 + c1) * (mu_pp + mu_tt + c2)
    return jnp.mean(num / den)


class LPIPS:
    """Optional LPIPS wrapper (requires the `lpips` package + weights).

    Mirrors reference evaluate.py:28-48 semantics: inputs in [0, 1] are
    rescaled to [-1, 1]. Raises at construction when unavailable.
    """

    def __init__(self, net: str = "vgg"):
        try:
            import torch  # noqa: F401
            import lpips as lpips_pkg
        except Exception as e:  # pragma: no cover - environment dependent
            raise RuntimeError(
                "LPIPS unavailable: needs `lpips` package and pretrained weights"
            ) from e
        self._torch = __import__("torch")
        self.model = lpips_pkg.LPIPS(net=net)

    def __call__(self, pred: np.ndarray, target: np.ndarray) -> float:
        """pred/target: [B, H, W, 3] in [0, 1] (numpy)."""
        t = self._torch
        to = lambda x: t.from_numpy(np.transpose(x, (0, 3, 1, 2))).float() * 2.0 - 1.0
        with t.no_grad():
            return float(self.model(to(pred), to(target)).mean())
