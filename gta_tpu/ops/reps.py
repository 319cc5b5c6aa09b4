"""Per-batch geometric representation tables (`GeomReps`).

This replaces the reference's mutable `extras` dict bus — which threads
closures and tensors from data loader through encoder into decoder
(encoder.py:183-265, decoder.py:247-353) — with an explicit, jit-friendly
pytree computed once per batch by pure functions. Static structure is
derived from the (hashable) GTAArgs config; array leaves only.

TPU-native choices:
  * SO(2) is stored as (cos, sin) rotor tables and applied RoPE-style —
    no [.., 2, 2] matrices on the hot path.
  * SE(3)/T(2) inverses are analytic (rotation-transpose / negated
    translation), never linear solves.
  * SO(3) Wigner-D matrices are regenerated from first principles
    (geometry/wigner.py) — no J_dense.pt asset.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct

from gta_tpu.config import GTAArgs
from gta_tpu.geometry.so2 import so2_angles, make_so2_mats
from gta_tpu.geometry.se3 import se3_inverse
from gta_tpu.geometry.t2 import make_t2_mats, make_t2_mats_inv
from gta_tpu.geometry.wigner import wigner_d_matrices
from gta_tpu.geometry.rays import ray_to_rotation


@struct.dataclass
class GeomReps:
    """Representation tables for one attention call (query side vs key side).

    Shapes (B batch, Nq/Nk views, Tq/Tk tokens-per-side, R rotors):
      so2_*:   (cos, sin) each [B, T, R]
      se3_*:   [B, N, 4, 4]  (or [B, N, T', 4, 4] with ray_to_se3)
      se3_*_inv: the unmasked inverse (i.e. the original extrinsic)
      so3_*:   tuple over degrees 1..n of [B, N, 2d+1, 2d+1]
      t2_*:    [B, T, 3, 3]
      flat_*:  [B, T, F] flattened rep vectors (elementwise_mul ablation)
    """

    so2_q: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
    so2_k: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
    se3_q: Optional[jnp.ndarray] = None
    se3_q_inv: Optional[jnp.ndarray] = None
    se3_k: Optional[jnp.ndarray] = None
    so3_q: Optional[Tuple[jnp.ndarray, ...]] = None
    so3_k: Optional[Tuple[jnp.ndarray, ...]] = None
    t2_q: Optional[jnp.ndarray] = None
    t2_q_inv: Optional[jnp.ndarray] = None
    t2_k: Optional[jnp.ndarray] = None
    flat_q: Optional[jnp.ndarray] = None
    flat_k: Optional[jnp.ndarray] = None
    flat_q_inv: Optional[jnp.ndarray] = None


def _so2_rotors(coord: jnp.ndarray, args: GTAArgs):
    """coord [B, N, T, 2] (or [B, T, 2]) -> (cos, sin) each [B, N*T, R]."""
    coord = coord.reshape(coord.shape[0], -1, 2)
    theta = so2_angles(
        coord, args.so2, (args.max_freq_h, args.max_freq_w), args.shared_freqs
    )
    return jnp.cos(theta), jnp.sin(theta)


def _so2_flat(coord: jnp.ndarray, args: GTAArgs):
    """Flattened SO(2) rep + inverse, each [B, T, R*4] (elementwise_mul path)."""
    coord = coord.reshape(coord.shape[0], -1, 2)
    mats = make_so2_mats(coord, args.so2, (args.max_freq_h, args.max_freq_w), args.shared_freqs)
    B, T = mats.shape[0], mats.shape[1]
    flat = mats.reshape(B, T, -1)
    flat_inv = jnp.swapaxes(mats, -1, -2).reshape(B, T, -1)
    return flat, flat_inv


def _se3_reps(transforms: jnp.ndarray, args: GTAArgs, rays: Optional[jnp.ndarray]):
    """rho = inv(E) (and its inverse E), optionally refined per-token by ray frames.

    transforms: [B, N, 4, 4] relative camera extrinsics. With ray_to_se3,
    rays [B, N, T, 3] refine rho to rho @ R_ray and inverse to R_ray^T @ E
    (reference encoder.py:220-231).
    """
    rho = se3_inverse(transforms)
    inv = transforms
    if args.ray_to_se3:
        assert rays is not None, "ray_to_se3 requires rays"
        R = ray_to_rotation(rays, return_4x4=True)  # [B, N, T, 4, 4]
        rho = jnp.einsum("bnij,bntjk->bntik", rho, R)
        inv = jnp.einsum("bntij,bnjk->bntik", jnp.swapaxes(R, -1, -2), inv)
    return rho, inv


def _se3_flat(extrinsic: jnp.ndarray, tokens_per_side: int):
    """Flattened SE(3) rep vectors [B, T, 16] (elementwise_mul path).

    Mirrors reference encoder.py:238-243: the *extrinsic* transposed is the
    "rep" vector and the extrinsic itself the inverse, repeated per token.
    """
    B, N = extrinsic.shape[0], extrinsic.shape[1]
    reps = jnp.repeat(extrinsic, tokens_per_side // N, axis=1)  # [B, T, 4, 4]
    flat = jnp.swapaxes(reps, -1, -2).reshape(B, -1, 16)
    flat_inv = reps.reshape(B, -1, 16)
    return flat, flat_inv


def _so3_reps(transforms: jnp.ndarray, args: GTAArgs):
    """Wigner-D matrices of degrees 1..so3 from inv(E) rotations.

    Returns tuple of [B, N, 2d+1, 2d+1]. zeroout/id ablations mirror
    reference encoder.py:251-258.
    """
    R = se3_inverse(transforms)[..., :3, :3]  # [B, N, 3, 3]
    B, N = R.shape[0], R.shape[1]
    mats = wigner_d_matrices(args.so3, R.reshape(B * N, 3, 3))[1:]
    out = []
    for D in mats:
        d = D.shape[-1]
        if args.zeroout_so3:
            out.append(jnp.zeros((B, N, d, d), dtype=D.dtype))
        elif args.id_so3:
            out.append(jnp.broadcast_to(jnp.eye(d, dtype=D.dtype), (B, N, d, d)))
        else:
            out.append(D.reshape(B, N, d, d))
    return tuple(out)


def encoder_reps(
    args: GTAArgs,
    input_coord: Optional[jnp.ndarray] = None,
    input_transforms: Optional[jnp.ndarray] = None,
    input_rays: Optional[jnp.ndarray] = None,
) -> GeomReps:
    """Self-attention reps: query side == key side == input views.

    Args:
        input_coord: [B, N, T', 2] patch-center coords.
        input_transforms: [B, N, 4, 4] relative extrinsics (canonical frame).
        input_rays: [B, N, T', 3] patch-center rays (only for ray_to_se3).
    """
    fd = args.f_dims
    r = GeomReps()
    n_tokens = None
    if fd.so2 > 0:
        rot = _so2_rotors(input_coord, args)
        n_tokens = rot[0].shape[1]
        r = r.replace(so2_q=rot, so2_k=rot)
    if fd.t2 > 0:
        coord = input_coord.reshape(input_coord.shape[0], -1, 2)
        n_tokens = coord.shape[1]
        r = r.replace(
            t2_q=make_t2_mats(coord), t2_q_inv=make_t2_mats_inv(coord), t2_k=make_t2_mats(coord)
        )
    if fd.se3 > 0:
        rho, inv = _se3_reps(input_transforms, args, input_rays)
        r = r.replace(se3_q=rho, se3_q_inv=inv, se3_k=rho)
    if fd.so3 > 0:
        D = _so3_reps(input_transforms, args)
        r = r.replace(so3_q=D, so3_k=D)

    if args.elementwise_mul:
        flats, flats_inv = [], []
        if fd.so2 > 0:
            f, fi = _so2_flat(input_coord, args)
            flats.append(f)
            flats_inv.append(fi)
        if fd.se3 > 0:
            assert n_tokens is not None, "elementwise_mul SE(3) needs a token count (SO(2) or T(2) active)"
            f, fi = _se3_flat(input_transforms, n_tokens)
            flats.append(f)
            flats_inv.append(fi)
        flat = jnp.concatenate(flats, -1)
        flat_inv = jnp.concatenate(flats_inv, -1)
        r = r.replace(flat_q=flat, flat_k=flat, flat_q_inv=flat_inv)
    return r


def decoder_reps(
    args: GTAArgs,
    target_coord: Optional[jnp.ndarray] = None,
    target_transforms: Optional[jnp.ndarray] = None,
    target_rays: Optional[jnp.ndarray] = None,
    input_coord: Optional[jnp.ndarray] = None,
    input_transforms: Optional[jnp.ndarray] = None,
    input_rays: Optional[jnp.ndarray] = None,
    enc: Optional[GeomReps] = None,
) -> GeomReps:
    """Cross-attention reps: query side = target rays, key side = input views.

    Key-side tables are reused from the encoder's GeomReps when available
    (the explicit analogue of reference decoder.py:311 `'se3rep_k' not in
    extras`); otherwise recomputed from the input geometry.
    """
    fd = args.f_dims
    r = GeomReps()
    n_tokens = None
    if fd.so2 > 0:
        rot_q = _so2_rotors(target_coord, args)
        n_tokens = rot_q[0].shape[1]
        if args.recompute_so2 or enc is None or enc.so2_k is None:
            rot_k = _so2_rotors(input_coord, args)
        else:
            rot_k = enc.so2_k
        r = r.replace(so2_q=rot_q, so2_k=rot_k)
    if fd.t2 > 0:
        coord = target_coord.reshape(target_coord.shape[0], -1, 2)
        n_tokens = coord.shape[1]
        t2_k = (
            enc.t2_k
            if enc is not None and enc.t2_k is not None
            else make_t2_mats(input_coord.reshape(input_coord.shape[0], -1, 2))
        )
        r = r.replace(t2_q=make_t2_mats(coord), t2_q_inv=make_t2_mats_inv(coord), t2_k=t2_k)
    if fd.se3 > 0:
        rho_q, inv_q = _se3_reps(target_transforms, args, target_rays)
        if enc is not None and enc.se3_k is not None:
            rho_k = enc.se3_k
        else:
            rho_k, _ = _se3_reps(input_transforms, args, input_rays)
        r = r.replace(se3_q=rho_q, se3_q_inv=inv_q, se3_k=rho_k)
    if fd.so3 > 0:
        D_q = _so3_reps(target_transforms, args)
        D_k = (
            enc.so3_k
            if enc is not None and enc.so3_k is not None
            else _so3_reps(input_transforms, args)
        )
        r = r.replace(so3_q=D_q, so3_k=D_k)

    if args.elementwise_mul:
        flats, flats_inv = [], []
        if fd.so2 > 0:
            f, fi = _so2_flat(target_coord, args)
            flats.append(f)
            flats_inv.append(fi)
        if fd.se3 > 0:
            assert n_tokens is not None
            f, fi = _se3_flat(target_transforms, n_tokens)
            flats.append(f)
            flats_inv.append(fi)
        flat_k = enc.flat_k if enc is not None and enc.flat_k is not None else None
        r = r.replace(
            flat_q=jnp.concatenate(flats, -1),
            flat_q_inv=jnp.concatenate(flats_inv, -1),
            flat_k=flat_k,
        )
    return r
