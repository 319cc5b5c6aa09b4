"""Training runtime for the DiT-2DGTA family (diffusion analogue of
train/trainer.py): one fused jit train step (q_sample -> model -> hybrid
loss -> AdamW update) with donated state, data-parallel via sharding
annotations, and a compiled DDIM/CFG sampler for visual evidence.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from gta_tpu.config import TrainConfig, _parse_attn, _parse_training
from gta_tpu.models.dit import DiTConfig, build_dit
from gta_tpu.train import diffusion
from gta_tpu.train.schedule import warmup_exp_decay
from gta_tpu.train.trainer import TrainState


@dataclasses.dataclass(frozen=True)
class DiTDataConfig:
    dataset: str = "images_synthetic"  # 'images_synthetic' | 'imagenet'
    path: str = ""
    num_images: int = 50000


@dataclasses.dataclass(frozen=True)
class DiTRunConfig:
    model: DiTConfig = DiTConfig()
    data: DiTDataConfig = DiTDataConfig()
    training: TrainConfig = TrainConfig()
    seed: int = 0


def dit_config_from_dict(raw: dict) -> DiTRunConfig:
    m = raw.get("model", {})
    kw = (m.get("args", {}) or {}).get("dit_kwargs", {}) or {}
    attn = _parse_attn(kw.get("attn_args", {}) or {})
    model = DiTConfig(
        input_size=int(kw.get("input_size", 32)),
        patch_size=int(kw.get("patch_size", 2)),
        in_channels=int(kw.get("in_channels", 3)),
        hidden_size=int(kw.get("hidden_size", 384)),
        depth=int(kw.get("depth", 12)),
        heads=int(kw.get("heads", 6)),
        mlp_ratio=float(kw.get("mlp_ratio", 4.0)),
        num_classes=int(kw.get("num_classes", 1000)),
        class_dropout=float(kw.get("class_dropout", 0.1)),
        learn_sigma=bool(kw.get("learn_sigma", True)),
        attn=attn,
        timesteps=int(kw.get("timesteps", 1000)),
        vb_weight=float(kw.get("vb_weight", 1.0)),
    )
    d = raw.get("data", {}) or {}
    data = DiTDataConfig(
        dataset=d.get("dataset", "images_synthetic"),
        path=d.get("path") or "",
        num_images=int(d.get("num_images", 50000)),
    )
    return DiTRunConfig(
        model=model,
        data=data,
        training=_parse_training(raw.get("training", {}) or {}),
        seed=int(raw.get("seed", 0)),
    )


def load_dit_config(path: str) -> DiTRunConfig:
    with open(path) as f:
        return dit_config_from_dict(yaml.safe_load(f))


class DiTTrainer:
    """Owns the DiT model, schedule tables, and compiled step/sampler."""

    def __init__(self, cfg: DiTRunConfig, mesh=None):
        t = cfg.training
        self.cfg = cfg
        self.dtype = jnp.bfloat16 if t.mixed_prec else jnp.float32
        mcfg = cfg.model
        flash_mode = t.flash
        if flash_mode == "auto":
            flash_mode = "fused" if jax.default_backend() == "tpu" else "off"
        if flash_mode in ("on", "fused") and mcfg.attn.flash_eligible:
            mcfg = dataclasses.replace(
                mcfg,
                attn=dataclasses.replace(
                    mcfg.attn, flash=True, fused=flash_mode == "fused"
                ),
            )
            self.cfg = dataclasses.replace(cfg, model=mcfg)
        self.model = build_dit(mcfg, dtype=self.dtype)
        self.sch = diffusion.make_schedule(mcfg.timesteps, mcfg.beta_start, mcfg.beta_end)
        self.schedule = warmup_exp_decay(t.lr, t.lr_warmup, t.decay_it, t.decay_rate)
        self.tx = (
            optax.adam(self.schedule)
            if t.noadamW
            else optax.adamw(self.schedule, weight_decay=t.weight_decay)
        )
        self.mesh = mesh
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._init = jax.jit(
            lambda rng, x, t_, y: self.model.init(rng, x, t_, y, deterministic=True)
        )
        self._sample = jax.jit(
            self._sample_impl, static_argnames=("n", "steps", "guidance")
        )

    # ------------------------------------------------------------------
    def init_state(self, batch: Dict[str, np.ndarray], seed: int = 0) -> TrainState:
        x = jnp.asarray(batch["image"])
        y = jnp.asarray(batch["label"])
        t = jnp.zeros((x.shape[0],), jnp.int32)
        params = self._init(jax.random.PRNGKey(seed), x, t, y)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
        )

    def param_count(self, state: TrainState) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))

    # ------------------------------------------------------------------
    def _loss_fn(self, params, images, labels, rng):
        mcfg = self.cfg.model
        r_t, r_n, r_drop = jax.random.split(rng, 3)
        B = images.shape[0]
        t = jax.random.randint(r_t, (B,), 0, self.sch.timesteps)
        noise = jax.random.normal(r_n, images.shape, jnp.float32)

        def model_fn(x_t, tt):
            return self.model.apply(
                params, x_t, tt, labels, deterministic=False,
                rngs={"label_drop": r_drop},
            )

        loss, metrics = diffusion.training_loss(
            self.sch, model_fn, images, t, noise,
            learn_sigma=mcfg.learn_sigma, vb_weight=mcfg.vb_weight,
        )
        return loss, metrics

    def _train_step_impl(self, state: TrainState, images, labels, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state.params, images, labels, rng
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["lr"] = self.schedule(state.step)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    def train_step(self, state, batch, rng) -> Tuple[TrainState, Dict]:
        return self._train_step(
            state, jnp.asarray(batch["image"]), jnp.asarray(batch["label"]), rng
        )

    # ------------------------------------------------------------------
    def _eval_step_impl(self, params, images, labels, rng):
        # fixed-seed eval loss: deterministic t/noise draws per batch
        loss, metrics = self._loss_fn(params, images, labels, rng)
        return metrics

    def evaluate(self, params, batches, seed: int = 0) -> Dict[str, float]:
        acc: Dict[str, list] = {}
        for i, batch in enumerate(batches):
            out = self._eval_step(
                params,
                jnp.asarray(batch["image"]),
                jnp.asarray(batch["label"]),
                jax.random.PRNGKey(seed * 100003 + i),
            )
            for k, v in out.items():
                acc.setdefault(k, []).append(float(v))
        return {k: float(np.mean(v)) for k, v in acc.items()}

    # ------------------------------------------------------------------
    def _sample_impl(self, params, labels, rng, n: int, steps: int, guidance: float):
        mcfg = self.cfg.model
        shape = (n, mcfg.input_size, mcfg.input_size, mcfg.in_channels)

        def cond_fn(x, t, y):
            return self.model.apply(params, x, t, y, deterministic=True)

        fn = diffusion.cfg_model_fn(cond_fn, labels, mcfg.null_label, guidance)
        return diffusion.ddim_sample(
            self.sch, fn, shape, rng, steps=steps, learn_sigma=mcfg.learn_sigma
        )

    def sample(
        self,
        params,
        labels,
        rng,
        steps: int = 50,
        guidance: float = 4.0,
    ) -> np.ndarray:
        """Class-conditional DDIM samples [N, H, W, C] in [-1, 1]."""
        labels = jnp.asarray(labels)
        out = self._sample(
            params, labels, rng, n=int(labels.shape[0]), steps=steps,
            guidance=float(guidance),
        )
        return np.asarray(jnp.clip(out, -1.0, 1.0))
