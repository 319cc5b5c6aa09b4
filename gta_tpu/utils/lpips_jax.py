"""Pure-JAX LPIPS (VGG16 variant) — the reference's third eval metric.

The reference scores LPIPS with the `lpips` package (evaluate.py:28-48,
87-88): inputs scaled to [-1, 1], ImageNet-style shift/scale, VGG16
features at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, channel-unit-
normalized differences weighted by learned 1x1 "lin" layers, spatially
averaged and summed over stages.

This module reimplements that computation in JAX. Pretrained weights are
not shipped (zero-egress environment) — export them once wherever
torchvision + lpips are installed:

    python scripts/export_lpips_weights.py lpips_vgg.npz

and point `LPIPS_WEIGHTS` (env var) or the `weights` argument at the file.
The architecture/port is validated against a from-scratch torch
implementation with identical random weights in tests/test_metrics.py.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before) per conv layer, and which
# conv outputs (post-ReLU) feed LPIPS stages.
VGG16_CONVS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
POOL_BEFORE = (False, False, True, False, True, False, False, True, False,
               False, True, False, False)
STAGE_AFTER_CONV = (1, 3, 6, 9, 12)  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3

# lpips.LPIPS scaling layer constants
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def random_params(rng: np.random.RandomState, scale: float = 0.1) -> Dict[str, np.ndarray]:
    """Random weights in the exported-npz convention (for port validation)."""
    params = {}
    c_in = 3
    for i, c_out in enumerate(VGG16_CONVS):
        params[f"conv{i}_w"] = rng.randn(3, 3, c_in, c_out).astype(np.float32) * scale
        params[f"conv{i}_b"] = rng.randn(c_out).astype(np.float32) * scale
        c_in = c_out
    for j, conv_idx in enumerate(STAGE_AFTER_CONV):
        c = VGG16_CONVS[conv_idx]
        params[f"lin{j}_w"] = np.abs(rng.randn(c).astype(np.float32)) * scale
    return params


def _features(x: jnp.ndarray, params: Dict[str, jnp.ndarray]) -> Sequence[jnp.ndarray]:
    """VGG16 stage features for x [B, H, W, 3] already shift/scale-normalized."""
    feats = []
    h = x
    for i in range(len(VGG16_CONVS)):
        if POOL_BEFORE[i]:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        h = jax.lax.conv_general_dilated(
            h, params[f"conv{i}_w"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"conv{i}_b"]
        h = jax.nn.relu(h)
        if i in STAGE_AFTER_CONV:
            feats.append(h)
    return feats


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    return f / jnp.sqrt(jnp.sum(f**2, axis=-1, keepdims=True) + eps)


def lpips_distance(
    pred: jnp.ndarray, target: jnp.ndarray, params: Dict[str, jnp.ndarray]
) -> jnp.ndarray:
    """LPIPS distance per batch item. pred/target [B, H, W, 3] in [0, 1]."""
    shift = jnp.asarray(SHIFT)
    scale = jnp.asarray(SCALE)

    def norm_in(x):
        return ((x * 2.0 - 1.0) - shift) / scale

    fp = _features(norm_in(pred), params)
    ft = _features(norm_in(target), params)
    total = 0.0
    for j, (a, b) in enumerate(zip(fp, ft)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        w = params[f"lin{j}_w"]
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


class LPIPSJax:
    """Stateful wrapper: loads weights once, jits the distance."""

    def __init__(self, weights: Optional[str] = None):
        path = weights or os.environ.get("LPIPS_WEIGHTS", "")
        if not path or not os.path.exists(path):
            raise RuntimeError(
                "LPIPS weights not found — export with "
                "scripts/export_lpips_weights.py and set LPIPS_WEIGHTS"
            )
        loaded = np.load(path)
        self.params = {k: jnp.asarray(loaded[k]) for k in loaded.files}
        self._fn = jax.jit(lambda p, t: lpips_distance(p, t, self.params))

    def __call__(self, pred: np.ndarray, target: np.ndarray) -> float:
        return float(jnp.mean(self._fn(jnp.asarray(pred), jnp.asarray(target))))
