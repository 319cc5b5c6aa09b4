"""Property tests for SO(2)/T(2)/SE(3) reps and ray geometry."""

import numpy as np
import jax.numpy as jnp

from gta_tpu.geometry.so2 import so2_angles, make_so2_mats, apply_rotor, apply_rotor_inv
from gta_tpu.geometry.t2 import make_t2_mats, make_t2_mats_inv
from gta_tpu.geometry.se3 import se3_inverse, scale_mask, rigid_transform, rotate_z_mat
from gta_tpu.geometry.rays import (
    lookat_extrinsic,
    camera_rays,
    camera_rays_from_extrinsic,
    transform_points,
    ray_to_rotation,
)
from tests.conftest import random_se3

ATOL = 1e-5


class TestSO2:
    def test_additivity(self, rng):
        c1 = jnp.asarray(rng.rand(4, 7, 2), jnp.float32)
        c2 = jnp.asarray(rng.rand(4, 7, 2), jnp.float32)
        m1 = np.asarray(make_so2_mats(c1, 3, (1.0, 2.0)), np.float64)
        m2 = np.asarray(make_so2_mats(c2, 3, (1.0, 2.0)), np.float64)
        m12 = np.asarray(make_so2_mats(c1 + c2, 3, (1.0, 2.0)), np.float64)
        np.testing.assert_allclose(m12, m1 @ m2, atol=1e-4)

    def test_freq_ladder_matches_reference_convention(self):
        """freqs[j] = 2^(j+1)/2^n — ascending, NOT the standard RoPE ladder;
        channel order is frequency-major interleaved over coord dims
        (reference gta.py:66-68 + encoder.py:196 flatten(-4,-3))."""
        coord = jnp.asarray([[1.0, 0.0]])
        th = np.asarray(so2_angles(coord, 3, (1.0, 1.0)))
        expect = 2 * np.pi * np.array([2.0 / 8, 4.0 / 8, 8.0 / 8])
        np.testing.assert_allclose(th[0, 0::2], expect, atol=1e-6)
        np.testing.assert_allclose(th[0, 1::2], 0.0, atol=1e-6)

    def test_rotor_matches_matrix(self, rng):
        coord = jnp.asarray(rng.rand(2, 5, 2), jnp.float32)
        th = so2_angles(coord, 4, (1.0, 1.0))
        cos, sin = jnp.cos(th), jnp.sin(th)
        x = jnp.asarray(rng.randn(2, 5, 8, 2), jnp.float32)
        mats = make_so2_mats(coord, 4, (1.0, 1.0))
        want = np.einsum("btcij,btcj->btci", np.asarray(mats), np.asarray(x))
        got = np.asarray(apply_rotor(cos, sin, x))
        np.testing.assert_allclose(got, want, atol=ATOL)
        # inverse undoes forward
        back = np.asarray(apply_rotor_inv(cos, sin, apply_rotor(cos, sin, x)))
        np.testing.assert_allclose(back, np.asarray(x), atol=ATOL)


class TestT2:
    def test_inverse(self, rng):
        c = jnp.asarray(rng.randn(3, 6, 2), jnp.float32)
        m = np.asarray(make_t2_mats(c), np.float64)
        mi = np.asarray(make_t2_mats_inv(c), np.float64)
        np.testing.assert_allclose(m @ mi, np.broadcast_to(np.eye(3), m.shape), atol=ATOL)

    def test_composition(self, rng):
        c1 = jnp.asarray(rng.randn(4, 2), jnp.float32)
        c2 = jnp.asarray(rng.randn(4, 2), jnp.float32)
        lhs = np.asarray(make_t2_mats(c1 + c2))
        rhs = np.asarray(make_t2_mats(c1)) @ np.asarray(make_t2_mats(c2))
        np.testing.assert_allclose(lhs, rhs, atol=ATOL)


class TestSE3:
    def test_inverse(self, rng):
        E = jnp.asarray(random_se3(rng, 8))
        inv = np.asarray(se3_inverse(E), np.float64)
        np.testing.assert_allclose(
            inv @ np.asarray(E, np.float64), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-4
        )

    def test_scale_mask_is_conjugation(self, rng):
        """(E * msk) equals S E S^-1 — masking preserves products/inverses."""
        tc = 0.37
        E = np.asarray(random_se3(rng, 4), np.float64)
        msk = np.asarray(scale_mask(tc), np.float64)
        S = np.diag([1.0, 1.0, 1.0, 1.0 / tc])
        np.testing.assert_allclose(E * msk, S @ E @ np.linalg.inv(S), atol=1e-6)
        # masked rep and masked inverse stay exact inverses
        inv = np.asarray(se3_inverse(jnp.asarray(E, jnp.float32)), np.float64)
        np.testing.assert_allclose(
            (E * msk) @ (inv * msk), np.broadcast_to(np.eye(4), E.shape), atol=1e-4
        )

    def test_rigid_transform(self, rng):
        E = jnp.asarray(random_se3(rng, 2))
        p = jnp.asarray(rng.randn(2, 5, 3), jnp.float32)
        got = np.asarray(rigid_transform(E, p))
        Ee = np.asarray(E)
        want = np.einsum("bij,bkj->bki", Ee[:, :3, :3], np.asarray(p)) + Ee[:, None, :3, 3]
        np.testing.assert_allclose(got, want, atol=1e-5)
        # directions ignore translation
        got_d = np.asarray(rigid_transform(E, p, trans_coeff=0.0))
        want_d = np.einsum("bij,bkj->bki", Ee[:, :3, :3], np.asarray(p))
        np.testing.assert_allclose(got_d, want_d, atol=1e-5)

    def test_rotate_z(self):
        R = np.asarray(rotate_z_mat(np.pi / 2))
        p = np.array([1.0, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(R @ p, [0.0, 1.0, 0.0, 1.0], atol=1e-6)


class TestRays:
    def test_lookat_orthonormal(self, rng):
        pos = rng.randn(3) * 3 + np.array([0, 0, 2.0])
        E = lookat_extrinsic(pos)
        R = E[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        # camera origin maps to 0
        np.testing.assert_allclose(E[:3, :3] @ pos + E[:3, 3], 0.0, atol=1e-5)

    def test_camera_rays_unit_and_forward(self, rng):
        pos = np.array([3.0, -2.0, 2.0])
        rays = camera_rays(pos, width=16, height=12)
        np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-5)
        # central ray points at the origin
        center = rays[6, 8]
        toward = -pos / np.linalg.norm(pos)
        assert np.dot(center, toward) > 0.999

    def test_rays_consistent_with_extrinsic(self):
        pos = np.array([1.5, 2.5, 3.0])
        E = lookat_extrinsic(pos)
        r1 = camera_rays(pos, width=8, height=6)
        r2 = camera_rays_from_extrinsic(E, pos, width=8, height=6)
        np.testing.assert_allclose(r1, r2, atol=1e-5)

    def test_transform_points_roundtrip(self, rng):
        E = random_se3(rng, 1)[0]
        p = rng.randn(10, 3).astype(np.float32)
        q = transform_points(p, E)
        back = transform_points(q, np.linalg.inv(E))
        np.testing.assert_allclose(back, p, atol=1e-4)

    def test_ray_to_rotation_frames(self, rng):
        rays = rng.randn(4, 6, 3).astype(np.float32)
        rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
        R = np.asarray(ray_to_rotation(jnp.asarray(rays)))
        # column 2 is the ray; orthonormal frame
        np.testing.assert_allclose(R[..., :, 2], rays, atol=1e-5)
        RtR = np.einsum("...ij,...ik->...jk", R, R)
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), R.shape), atol=1e-4)
