"""Tests for volumetric sampling/integration utilities."""

import numpy as np
import jax
import jax.numpy as jnp

from gta_tpu.geometry.nerf import (
    stratified_sample_points,
    sample_pdf,
    fine_sample_points,
    integrate_ray,
)


def test_stratified_deterministic():
    pos = jnp.zeros((4, 3))
    rays = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4, 3))
    depths, points = stratified_sample_points(
        None, pos, rays, min_dist=1.0, max_dist=5.0, num_samples=8, deterministic=True
    )
    assert depths.shape == (4, 8)
    assert float(depths.min()) >= 1.0 and float(depths.max()) <= 5.0
    assert (np.diff(np.asarray(depths), axis=-1) > 0).all()
    np.testing.assert_allclose(np.asarray(points[..., 2]), np.asarray(depths), atol=1e-6)


def test_stratified_min_z_clips_far():
    pos = jnp.asarray([[0.0, 0.0, 10.0]])
    rays = jnp.asarray([[0.0, 0.0, -1.0]])  # looking down
    depths, _ = stratified_sample_points(
        None, pos, rays, min_dist=0.1, max_dist=100.0, num_samples=16,
        min_z=0.0, deterministic=True,
    )
    assert float(depths.max()) <= 10.0 + 1e-4


def test_sample_pdf_concentrates():
    """Samples should land in the high-probability bin."""
    bins = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])
    weights = jnp.asarray([[0.0, 1.0, 0.0]])
    s = sample_pdf(jax.random.PRNGKey(0), bins, weights, 64)
    frac = float(((s > 1.0) & (s < 2.0)).mean())
    assert frac > 0.95


def test_fine_sampling_shapes():
    pos = jnp.zeros((5, 3))
    rays = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (5, 3))
    depths = jnp.broadcast_to(jnp.linspace(1.0, 4.0, 8), (5, 8))
    dist = jnp.full((5, 8), 1.0 / 8)
    d, p = fine_sample_points(jax.random.PRNGKey(1), pos, rays, dist, depths, num_samples=16)
    assert d.shape == (5, 16) and p.shape == (5, 16, 3)
    assert np.isfinite(np.asarray(d)).all()


def test_integrate_opaque_surface():
    """A single very dense sample should dominate the composite."""
    S = 8
    depths = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S), (1, S))
    dens = jnp.zeros((1, S)).at[0, 3].set(1e6)
    vals = jnp.zeros((1, S, 3)).at[0, 3].set(jnp.asarray([1.0, 0.5, 0.25]))
    rgba, depth, probs = integrate_ray(dens, vals, depths)
    np.testing.assert_allclose(np.asarray(rgba[0, :3]), [1.0, 0.5, 0.25], atol=1e-4)
    assert float(rgba[0, 3]) > 0.999
    np.testing.assert_allclose(float(depth[0]), float(depths[0, 3]), atol=1e-3)


def test_integrate_empty_ray():
    S = 8
    depths = jnp.broadcast_to(jnp.linspace(1.0, 2.0, S), (1, S))
    rgba, _, _ = integrate_ray(jnp.zeros((1, S)), jnp.ones((1, S, 3)), depths)
    assert float(rgba[0, 3]) < 1e-4
