"""Test configuration: force CPU backend with 8 virtual devices.

Must set XLA flags before jax is imported anywhere; pytest imports conftest
first, so keep all jax imports below the env setup.
"""

import os

# The container's axon TPU plugin overrides the JAX_PLATFORMS env var, so
# setting the env var alone is not enough — also force via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def random_rotation(rng, n):
    """Batch of uniform-ish random rotation matrices [n, 3, 3] via QR."""
    A = rng.normal(size=(n, 3, 3))
    Q, R = np.linalg.qr(A)
    # Fix sign so det = +1
    d = np.sign(np.diagonal(R, axis1=-2, axis2=-1))
    Q = Q * d[:, None, :]
    det = np.linalg.det(Q)
    Q[:, :, 0] *= det[:, None]
    return Q.astype(np.float64)


def random_se3(rng, n, tscale=1.0):
    """Batch of random rigid transforms [n, 4, 4]."""
    R = random_rotation(rng, n)
    t = rng.normal(size=(n, 3, 1)) * tscale
    top = np.concatenate([R, t], -1)
    bottom = np.tile(np.array([[[0.0, 0.0, 0.0, 1.0]]]), (n, 1, 1))
    return np.concatenate([top, bottom], 1).astype(np.float32)
