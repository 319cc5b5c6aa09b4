"""Gaussian diffusion runtime for the DiT-2DGTA model family.

The reference keeps its ImageNet DiT experiment on a separate git branch
that is absent from the snapshot (reference README.md:29-32); BASELINE.json
lists "ImageNet DiT generation with 2D GTA" as a target config. This module
is the TPU-native diffusion engine for that family: standard DDPM
(linear-beta, epsilon prediction) with the improved-DDPM learned variance
interpolation that the public DiT uses, implemented as pure functions over
precomputed fp32 schedule tables so the whole training loss and the whole
sampler compile into single XLA programs (`lax.scan`/`fori_loop` over
timesteps — no per-step host round trips).

Classifier-free guidance is a batched trick, not a second forward: the
sampler duplicates the batch with null labels and splits the prediction,
so guided sampling costs one model call per step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _linear_betas(timesteps: int, beta_start: float, beta_end: float) -> np.ndarray:
    # scaled-linear schedule of DDPM/DiT (improved-DDPM appendix)
    scale = 1000.0 / timesteps
    return np.linspace(scale * beta_start, scale * beta_end, timesteps, dtype=np.float64)


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Precomputed diffusion tables (all [T] fp32, held as numpy)."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_acp: np.ndarray
    sqrt_one_minus_acp: np.ndarray
    sqrt_recip_acp: np.ndarray
    sqrt_recipm1_acp: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance: np.ndarray
    posterior_mean_c0: np.ndarray
    posterior_mean_ct: np.ndarray

    @property
    def timesteps(self) -> int:
        return len(self.betas)


def make_schedule(
    timesteps: int = 1000, beta_start: float = 1e-4, beta_end: float = 2e-2
) -> Schedule:
    betas = _linear_betas(timesteps, beta_start, beta_end)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
    # clip t=0 (zero variance) for the log like improved-DDPM
    post_logvar = np.log(np.append(post_var[1], post_var[1:]))
    f32 = lambda x: x.astype(np.float32)
    return Schedule(
        betas=f32(betas),
        alphas_cumprod=f32(acp),
        alphas_cumprod_prev=f32(acp_prev),
        sqrt_acp=f32(np.sqrt(acp)),
        sqrt_one_minus_acp=f32(np.sqrt(1.0 - acp)),
        sqrt_recip_acp=f32(np.sqrt(1.0 / acp)),
        sqrt_recipm1_acp=f32(np.sqrt(1.0 / acp - 1.0)),
        posterior_variance=f32(post_var),
        posterior_log_variance=f32(post_logvar),
        posterior_mean_c0=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
        posterior_mean_ct=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
    )


def _take(table: np.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Gather schedule entries for per-item timesteps, broadcastable to x."""
    return jnp.asarray(table)[t][:, None, None, None]


def q_sample(sch: Schedule, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray):
    """Forward process: draw x_t ~ q(x_t | x_0)."""
    return _take(sch.sqrt_acp, t) * x0 + _take(sch.sqrt_one_minus_acp, t) * noise


def _pred_x0_from_eps(sch: Schedule, x_t, t, eps):
    return _take(sch.sqrt_recip_acp, t) * x_t - _take(sch.sqrt_recipm1_acp, t) * eps


def _posterior_mean(sch: Schedule, x0, x_t, t):
    return _take(sch.posterior_mean_c0, t) * x0 + _take(sch.posterior_mean_ct, t) * x_t


def _model_logvar(sch: Schedule, v, t):
    """Interpolate log-variance between beta (max) and posterior (min) from
    the model's raw v output in [-1, 1] (improved-DDPM eq. 15)."""
    min_log = _take(sch.posterior_log_variance, t)
    max_log = jnp.log(_take(sch.betas, t))
    frac = (v + 1.0) / 2.0
    return frac * max_log + (1.0 - frac) * min_log


def _normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def training_loss(
    sch: Schedule,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    learn_sigma: bool = True,
    vb_weight: float = 1.0,
) -> Tuple[jnp.ndarray, dict]:
    """Hybrid loss L_simple + vb_weight * L_vlb (improved-DDPM / DiT).

    model_fn(x_t, t) -> [B, H, W, C] eps prediction, or [B, H, W, 2C] with
    learn_sigma (eps ++ raw variance v). The VB term trains only the
    variance channels — the mean is stop-gradiented, exactly the DiT
    recipe, so L_simple alone drives eps.
    """
    x_t = q_sample(sch, x0, t, noise)
    out = model_fn(x_t, t).astype(jnp.float32)
    if learn_sigma:
        eps, v = jnp.split(out, 2, axis=-1)
    else:
        eps, v = out, None
    mse = jnp.mean((eps - noise) ** 2)
    metrics = {"mse": mse}
    loss = mse
    if learn_sigma:
        x0_hat = _pred_x0_from_eps(sch, x_t, t, jax.lax.stop_gradient(eps))
        model_mean = _posterior_mean(sch, x0_hat, x_t, t)
        model_logvar = _model_logvar(sch, v, t)
        true_mean = _posterior_mean(sch, x0, x_t, t)
        true_logvar = _take(sch.posterior_log_variance, t)
        kl = _normal_kl(true_mean, true_logvar, model_mean, model_logvar)
        # nats, averaged like improved-DDPM's mean_flat / log(2)
        vb = jnp.mean(kl) / np.log(2.0)
        metrics["vb"] = vb
        loss = loss + vb_weight * vb
    metrics["loss"] = loss
    return loss, metrics


def ddpm_sample(
    sch: Schedule,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    shape: Tuple[int, ...],
    rng: jax.Array,
    learn_sigma: bool = True,
    clip: Optional[float] = 1.0,
) -> jnp.ndarray:
    """Ancestral DDPM sampling, whole chain inside one jit (fori_loop)."""
    T = sch.timesteps
    rng, r0 = jax.random.split(rng)
    x = jax.random.normal(r0, shape, jnp.float32)

    def body(i, carry):
        x, rng = carry
        t_scalar = T - 1 - i
        t = jnp.full((shape[0],), t_scalar, jnp.int32)
        out = model_fn(x, t).astype(jnp.float32)
        if learn_sigma:
            eps, v = jnp.split(out, 2, axis=-1)
            logvar = _model_logvar(sch, v, t)
        else:
            eps = out
            logvar = _take(sch.posterior_log_variance, t)
        x0_hat = _pred_x0_from_eps(sch, x, t, eps)
        if clip is not None:
            x0_hat = jnp.clip(x0_hat, -clip, clip)
        mean = _posterior_mean(sch, x0_hat, x, t)
        rng, rn = jax.random.split(rng)
        noise = jax.random.normal(rn, shape, jnp.float32)
        nonzero = (t_scalar > 0).astype(jnp.float32)
        x = mean + nonzero * jnp.exp(0.5 * logvar) * noise
        return (x, rng)

    x, _ = jax.lax.fori_loop(0, T, body, (x, rng))
    return x


def ddim_sample(
    sch: Schedule,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    shape: Tuple[int, ...],
    rng: jax.Array,
    steps: int = 50,
    eta: float = 0.0,
    learn_sigma: bool = True,
    clip: Optional[float] = 1.0,
) -> jnp.ndarray:
    """DDIM sampling on an evenly-strided sub-schedule (fast path)."""
    T = sch.timesteps
    ts = np.linspace(0, T - 1, steps, dtype=np.int64)[::-1].copy()
    ts_prev = np.append(ts[1:], -1)
    acp = np.asarray(sch.alphas_cumprod)
    a_t = jnp.asarray(acp[ts], jnp.float32)
    a_prev = jnp.asarray(
        np.where(ts_prev >= 0, acp[np.maximum(ts_prev, 0)], 1.0), jnp.float32
    )
    t_tab = jnp.asarray(ts, jnp.int32)

    rng, r0 = jax.random.split(rng)
    x = jax.random.normal(r0, shape, jnp.float32)

    def body(i, carry):
        x, rng = carry
        t = jnp.full((shape[0],), t_tab[i], jnp.int32)
        out = model_fn(x, t).astype(jnp.float32)
        eps = jnp.split(out, 2, axis=-1)[0] if learn_sigma else out
        at, ap = a_t[i], a_prev[i]
        x0_hat = (x - jnp.sqrt(1.0 - at) * eps) / jnp.sqrt(at)
        if clip is not None:
            x0_hat = jnp.clip(x0_hat, -clip, clip)
        sigma = eta * jnp.sqrt((1.0 - ap) / (1.0 - at)) * jnp.sqrt(1.0 - at / ap)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - ap - sigma**2, 0.0)) * eps
        rng, rn = jax.random.split(rng)
        noise = jax.random.normal(rn, shape, jnp.float32)
        x = jnp.sqrt(ap) * x0_hat + dir_xt + sigma * noise
        return (x, rng)

    x, _ = jax.lax.fori_loop(0, steps, body, (x, rng))
    return x


def cfg_model_fn(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    labels: jnp.ndarray,
    null_label: int,
    guidance: float,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Classifier-free guidance wrapper: one batched call per step.

    model_fn(x, t, y) -> prediction. Returns fn(x, t) applying
    eps = eps_null + guidance * (eps_cond - eps_null) to the eps half
    (variance channels come from the conditional branch).
    """

    def fn(x, t):
        x2 = jnp.concatenate([x, x], 0)
        t2 = jnp.concatenate([t, t], 0)
        y2 = jnp.concatenate(
            [labels, jnp.full_like(labels, null_label)], 0
        )
        out = model_fn(x2, t2, y2)
        cond, uncond = jnp.split(out, 2, axis=0)
        C = x.shape[-1]
        eps = uncond[..., :C] + guidance * (cond[..., :C] - uncond[..., :C])
        if out.shape[-1] == 2 * C:
            return jnp.concatenate([eps, cond[..., C:]], -1)
        return eps

    return fn
