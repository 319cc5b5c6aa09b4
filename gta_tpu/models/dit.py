"""DiT with 2D geometric transform attention (the "DiT branch" family).

The reference keeps its ImageNet DiT experiment on a separate git branch
absent from the snapshot (reference README.md:29-32); BASELINE.json lists
"ImageNet DiT generation with 2D GTA (DiT branch, diffusion transformer)"
as a target config. This is the TPU-native build of that family: a
standard adaLN-Zero diffusion transformer whose self-attention applies the
2D restriction of GTA — per-token SO(2) rotor representations over patch
coordinates act on Q, K *and* V inside attention (the same `ops/gta.py`
machinery the NVS models use, with an SO(2)+trivial `f_dims` split) —
replacing the stock additive sin/cos positional embedding. `method: ''`
keeps the stock DiT (frozen sin/cos PE, plain attention) as the ablation
baseline.

TPU notes: tokens are a static H/p x W/p grid, so the rotor tables are
trace-time constants computed once per forward and shared by all blocks;
the attention core routes through the fused Pallas flash path when the
config enables it (`AttnConfig.fused`), exactly like the NVS stack.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gta_tpu.config import AttnConfig
from gta_tpu.geometry.coords import make_2dcoord
from gta_tpu.models.layers import _merge_heads, _split_heads
from gta_tpu.ops.attention import dot_product_attention
from gta_tpu.ops.gta import gta_attention
from gta_tpu.ops.reps import GeomReps, encoder_reps


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    """Static DiT hyper-parameters (DiT-S/2-like defaults)."""

    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 384
    depth: int = 12
    heads: int = 6
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    class_dropout: float = 0.1
    learn_sigma: bool = True
    attn: AttnConfig = AttnConfig()
    # diffusion schedule (consumed by train/diffusion.py)
    timesteps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 2e-2
    vb_weight: float = 1.0

    @property
    def grid(self) -> int:
        assert self.input_size % self.patch_size == 0
        return self.input_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def out_channels(self) -> int:
        return self.in_channels * (2 if self.learn_sigma else 1)

    @property
    def null_label(self) -> int:
        return self.num_classes


def _timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep features [B, dim] (DDPM convention)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)


def _sincos_pos_embed(grid: int, dim: int) -> np.ndarray:
    """Frozen 2D sin/cos positional table [grid*grid, dim] (stock DiT)."""
    assert dim % 4 == 0
    quarter = dim // 4
    omega = 1.0 / 10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter)
    pos = np.arange(grid, dtype=np.float64)
    out = np.einsum("p,f->pf", pos, omega)  # [grid, quarter]
    emb_1d = np.concatenate([np.sin(out), np.cos(out)], -1)  # [grid, dim/2]
    emb_h = np.repeat(emb_1d[:, None], grid, 1)  # varies along rows
    emb_w = np.repeat(emb_1d[None], grid, 0)  # varies along cols
    return np.concatenate([emb_h, emb_w], -1).reshape(grid * grid, dim).astype(np.float32)


class TimestepEmbedder(nn.Module):
    hidden_size: int
    freq_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        x = _timestep_embedding(t, self.freq_dim).astype(self.dtype)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x)
        x = nn.silu(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(x)


class LabelEmbedder(nn.Module):
    """Class-label table with CFG dropout to a null embedding row."""

    num_classes: int
    hidden_size: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y, deterministic: bool = True):
        table = nn.Embed(
            self.num_classes + 1, self.hidden_size, dtype=self.dtype, name="table"
        )
        if not deterministic and self.dropout > 0:
            rng = self.make_rng("label_drop")
            drop = jax.random.bernoulli(rng, self.dropout, y.shape)
            y = jnp.where(drop, self.num_classes, y)
        return table(y)


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None]) + shift[:, None]


class GTASelfAttention(nn.Module):
    """Self-attention with per-token 2D group reps applied to Q/K/V."""

    dim: int
    heads: int
    attn: AttnConfig = AttnConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, reps: Optional[GeomReps]):
        cfg = self.attn
        scale = (self.dim // self.heads) ** -0.5
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = (_split_heads(t, self.heads) for t in jnp.split(qkv, 3, -1))
        if cfg.method == "gta":
            if cfg.fused and not cfg.gta.euclid_sim:
                from gta_tpu.ops.gta_pallas import fused_gta_attention

                out = fused_gta_attention(
                    q, k, v, reps, cfg.gta, None, float(scale)
                )
            else:
                out, _ = gta_attention(
                    q,
                    k,
                    v,
                    lambda q, k, v: dot_product_attention(q, k, v, scale=scale, flash=cfg.flash),
                    reps,
                    cfg.gta,
                    None,
                )
        else:
            out, _ = dot_product_attention(q, k, v, scale=scale, flash=cfg.flash)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(_merge_heads(out))


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block (DiT): conditioning regresses per-branch
    shift/scale/gate, zero-initialized so each block starts as identity."""

    hidden_size: int
    heads: int
    mlp_ratio: float
    attn: AttnConfig = AttnConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, reps: Optional[GeomReps]):
        mod = nn.Dense(
            6 * self.hidden_size,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros_init(),
            name="ada_mod",
        )(nn.silu(c))
        s1, g1, gate1, s2, g2, gate2 = jnp.split(mod, 6, -1)
        ln = lambda n: nn.LayerNorm(
            use_bias=False, use_scale=False, dtype=self.dtype, name=n
        )
        h = _modulate(ln("norm1")(x), s1, g1)
        x = x + gate1[:, None] * GTASelfAttention(
            self.hidden_size, self.heads, self.attn, self.dtype, name="attn"
        )(h, reps)
        h = _modulate(ln("norm2")(x), s2, g2)
        mlp_dim = int(self.hidden_size * self.mlp_ratio)
        h = nn.Dense(mlp_dim, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + gate2[:, None] * h


class DiT(nn.Module):
    """Diffusion transformer over [B, H, W, C] images (NHWC)."""

    cfg: DiTConfig
    dtype: jnp.dtype = jnp.float32

    def _reps(self, batch: int) -> Optional[GeomReps]:
        cfg = self.cfg
        if cfg.attn.method != "gta":
            return None
        g = cfg.grid
        coord = jnp.asarray(make_2dcoord(g, g).reshape(1, 1, g * g, 2))
        coord = jnp.broadcast_to(coord, (batch, 1, g * g, 2))
        return encoder_reps(cfg.attn.gta, input_coord=coord)

    @nn.compact
    def __call__(self, x, t, y, deterministic: bool = True):
        cfg = self.cfg
        B = x.shape[0]
        p, g = cfg.patch_size, cfg.grid
        x = nn.Conv(
            cfg.hidden_size,
            (p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x.astype(self.dtype))
        x = x.reshape(B, g * g, cfg.hidden_size)
        if cfg.attn.method != "gta":
            # stock DiT: frozen sin/cos absolute PE; GTA replaces it entirely
            x = x + jnp.asarray(_sincos_pos_embed(g, cfg.hidden_size), self.dtype)

        c = TimestepEmbedder(cfg.hidden_size, dtype=self.dtype, name="t_embed")(t)
        c = c + LabelEmbedder(
            cfg.num_classes, cfg.hidden_size, cfg.class_dropout, self.dtype, name="y_embed"
        )(y, deterministic=deterministic)

        reps = self._reps(B)
        for i in range(cfg.depth):
            x = DiTBlock(
                cfg.hidden_size,
                cfg.heads,
                cfg.mlp_ratio,
                cfg.attn,
                self.dtype,
                name=f"block_{i}",
            )(x, c, reps)

        # final layer: adaLN modulation + zero-init projection to patches
        mod = nn.Dense(
            2 * cfg.hidden_size,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros_init(),
            name="final_mod",
        )(nn.silu(c))
        shift, scl = jnp.split(mod, 2, -1)
        x = _modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype, name="final_norm")(x),
            shift,
            scl,
        )
        x = nn.Dense(
            p * p * cfg.out_channels,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros_init(),
            name="final_proj",
        )(x)
        # unpatchify [B, g*g, p*p*C] -> [B, H, W, C]
        x = x.reshape(B, g, g, p, p, cfg.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, g * p, g * p, cfg.out_channels
        )
        return x.astype(jnp.float32)


def build_dit(cfg: DiTConfig, dtype=jnp.float32) -> DiT:
    if cfg.attn.method == "gta":
        fd = cfg.attn.gta.f_dims
        head_dim = cfg.hidden_size // cfg.heads
        assert fd.total == head_dim, (
            f"f_dims total {fd.total} != head dim {head_dim}"
        )
    return DiT(cfg, dtype=dtype)
