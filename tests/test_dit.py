"""DiT-2DGTA family: diffusion math, model forward, learning, sampling."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gta_tpu.config import AttnConfig, FDims, GTAArgs
from gta_tpu.models.dit import DiTConfig, build_dit
from gta_tpu.train import diffusion


def _tiny_cfg(method="gta"):
    attn = AttnConfig(
        method=method,
        gta=GTAArgs(f_dims=FDims(triv=8, so2=8), so2=2),
    )
    return DiTConfig(
        input_size=8,
        patch_size=2,
        in_channels=3,
        hidden_size=32,
        depth=2,
        heads=2,
        num_classes=4,
        attn=attn if method == "gta" else AttnConfig(method=""),
        timesteps=50,
    )


def test_schedule_tables():
    sch = diffusion.make_schedule(100, 1e-4, 2e-2)
    assert sch.timesteps == 100
    # cumulative products decrease monotonically from ~1
    assert np.all(np.diff(sch.alphas_cumprod) < 0)
    assert sch.alphas_cumprod_prev[0] == 1.0
    # posterior mean coefficients reconstruct x_t when x0 == x_t and the
    # process is noiseless only at matching coefficients sum
    np.testing.assert_allclose(
        sch.sqrt_acp**2 + sch.sqrt_one_minus_acp**2, 1.0, atol=1e-6
    )
    # x0 recovery inverts q_sample exactly for any eps
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    eps = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    t = jnp.asarray([3, 60])
    x_t = diffusion.q_sample(sch, x0, t, eps)
    x0_hat = diffusion._pred_x0_from_eps(sch, x_t, t, eps)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-3)


def test_model_logvar_interpolates():
    sch = diffusion.make_schedule(50)
    t = jnp.asarray([10, 40])
    x = jnp.zeros((2, 2, 2, 3))
    lo = diffusion._model_logvar(sch, x - 1.0, t)  # v=-1 -> posterior (min)
    hi = diffusion._model_logvar(sch, x + 1.0, t)  # v=+1 -> beta (max)
    np.testing.assert_allclose(
        np.asarray(lo)[:, 0, 0, 0], sch.posterior_log_variance[np.asarray(t)], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(hi)[:, 0, 0, 0], np.log(sch.betas)[np.asarray(t)], atol=1e-6
    )
    assert np.all(np.asarray(lo) <= np.asarray(hi) + 1e-6)


@pytest.mark.parametrize("method", ["gta", ""])
def test_dit_forward_shapes(method):
    cfg = _tiny_cfg(method)
    model = build_dit(cfg)
    x = jnp.zeros((2, 8, 8, 3))
    t = jnp.asarray([0, 10])
    y = jnp.asarray([1, 3])
    params = model.init(jax.random.PRNGKey(0), x, t, y, deterministic=True)
    out = model.apply(params, x, t, y, deterministic=True)
    assert out.shape == (2, 8, 8, 6)  # learn_sigma doubles channels
    # adaLN-zero: at init every block and the head are identity/zero
    assert np.allclose(np.asarray(out), 0.0)


def test_dit_learns_and_samples():
    """A tiny DiT fits a two-class toy distribution; DDIM sampler runs."""
    cfg = _tiny_cfg("gta")
    model = build_dit(cfg)
    sch = diffusion.make_schedule(cfg.timesteps)
    rng = np.random.RandomState(1)
    # class 0: constant +0.5 images, class 1: constant -0.5
    y = jnp.asarray(rng.randint(0, 2, 32))
    x0 = (0.5 - jnp.asarray(y, jnp.float32)[:, None, None, None]) * jnp.ones((32, 8, 8, 3))

    params = model.init(
        jax.random.PRNGKey(0), x0, jnp.zeros((32,), jnp.int32), y, deterministic=True
    )
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (32,), 0, cfg.timesteps)
        noise = jax.random.normal(kn, x0.shape)

        def loss_fn(p):
            fn = lambda xt, tt: model.apply(p, xt, tt, y, deterministic=True)
            return diffusion.training_loss(
                sch, fn, x0, t, noise, learn_sigma=True, vb_weight=0.001
            )

        (loss, m), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, m["mse"]

    key = jax.random.PRNGKey(0)
    first = None
    for i in range(60):
        key, k = jax.random.split(key)
        params, opt, mse = step(params, opt, k)
        if first is None:
            first = float(mse)
    assert float(mse) < first * 0.7, (first, float(mse))

    fn = diffusion.cfg_model_fn(
        lambda x, t, yy: model.apply(params, x, t, yy, deterministic=True),
        jnp.asarray([0, 1]),
        cfg.null_label,
        guidance=1.0,
    )
    out = diffusion.ddim_sample(sch, fn, (2, 8, 8, 3), jax.random.PRNGKey(2), steps=5)
    assert out.shape == (2, 8, 8, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_cfg_wrapper_guidance_zero_is_unconditional():
    """guidance=0 must return the null-label eps regardless of labels."""
    calls = {}

    def model_fn(x, t, y):
        calls["y"] = y
        # eps depends on label so cond/uncond differ
        return jnp.ones_like(x) * y[:, None, None, None].astype(jnp.float32)

    fn = diffusion.cfg_model_fn(model_fn, jnp.asarray([2, 3]), null_label=7, guidance=0.0)
    out = fn(jnp.zeros((2, 4, 4, 3)), jnp.zeros((2,), jnp.int32))
    np.testing.assert_allclose(np.asarray(out), 7.0)
    np.testing.assert_array_equal(np.asarray(calls["y"]), [2, 3, 7, 7])


def test_dit_config_roundtrip():
    from gta_tpu.train.dit_trainer import load_dit_config

    cfg = load_dit_config("runs/imagenet/DiT/dit_gta/config.yaml")
    assert cfg.model.attn.method == "gta"
    assert cfg.model.hidden_size == 384 and cfg.model.depth == 12
    assert cfg.model.attn.gta.f_dims.total == 384 // 6
    base = load_dit_config("runs/imagenet/DiT/dit_base/config.yaml")
    assert base.model.attn.method == ""


def test_device_images_generator():
    from gta_tpu.data.images import DeviceSyntheticImages, SyntheticImages

    gen = DeviceSyntheticImages(16, 10, "train", seed=0)
    b = gen.batch(0, 8)
    assert b["image"].shape == (8, 16, 16, 3)
    assert b["label"].shape == (8,)
    assert float(jnp.abs(b["image"]).max()) <= 1.0
    b2 = gen.batch(0, 8)
    assert np.allclose(np.asarray(b["image"]), np.asarray(b2["image"]))
    # fresh ids each step
    b3 = gen.batch(1, 8)
    assert not np.allclose(np.asarray(b["image"]), np.asarray(b3["image"]))
    # same class-conditional structure as the host dataset: per-class images
    # share orientation/frequency, so two same-class images correlate far
    # more after phase alignment than cross-class ones; cheap proxy — the
    # host and device image value distributions agree
    host = np.stack([SyntheticImages(16, 10, "train")[i]["image"] for i in range(64)])
    dev = np.asarray(DeviceSyntheticImages(16, 10, "train").batch(0, 64)["image"])
    assert abs(host.std() - dev.std()) < 0.05
    assert abs(host.mean() - dev.mean()) < 0.05


def test_spectral_classifier_exact_on_procedural():
    """The training-free FFT classifier (utils/stripe_classifier.py) must be
    exact on ground-truth procedural images — it is the judge for the DiT
    sample metric (scripts/eval_dit_samples.py), so any drift here would
    silently corrupt the family's quality number."""
    from gta_tpu.data.images import SyntheticImages, collate_images
    from gta_tpu.utils.stripe_classifier import accuracy

    ds = SyntheticImages(mode="val", num_images=120)
    batch = collate_images([ds[i] for i in range(120)])
    acc, per = accuracy(batch["image"], batch["label"])
    assert acc == 1.0, (acc, per)
