"""flax.linen building blocks: initializers, feed-forward, the multi-method
Attention dispatcher, and the pre-LN Transformer.

The Attention module covers all positional-encoding methods of the
reference's Attention (layers.py:172-444) behind one config switch:
'gta' (+ elementwise_mul / euclid / rpe variants), plain dot-product (''),
'ape', 'mln', 'gbt' (Plücker bias), and 'repast' (per-key-view augmented
Q/K). Compute dtype is a module attribute (params stay fp32) — the TPU
analogue of the reference's autocast mixed precision.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gta_tpu.config import AttnConfig
from gta_tpu.models.context import AttnContext
from gta_tpu.ops.attention import dot_product_attention, euclid_attention
from gta_tpu.ops.gta import gta_attention, vecrep_attention

# Initialization schemes (reference layers.py:14-49):
#   JaxLinear  = trunc-normal std sqrt(1/fan_in) == flax lecun_normal default
#   ViTLinear  = xavier uniform, bias ~ N(0, 1e-6)
#   SRTLinear  = xavier uniform, bias zeros
jax_linear_init = dict(kernel_init=nn.initializers.lecun_normal())
vit_linear_init = dict(
    kernel_init=nn.initializers.xavier_uniform(), bias_init=nn.initializers.normal(1e-6)
)
srt_linear_init = dict(
    kernel_init=nn.initializers.xavier_uniform(), bias_init=nn.initializers.zeros_init()
)


class FeedForward(nn.Module):
    """Dense-GELU-Dense with ViT init (reference layers.py:157-169)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, **vit_linear_init)(x)
        # exact erf GELU: the reference uses torch nn.GELU() (layers.py:161),
        # and the tanh approximation differs by ~1e-3 near |x|~2
        x = nn.gelu(x, approximate=False)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=self.dtype, **vit_linear_init)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def _split_heads(x, heads):
    B, T, HC = x.shape
    return x.reshape(B, T, heads, HC // heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, T, C = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * C)


class Attention(nn.Module):
    """Multi-method attention layer.

    kv_dim None => self-attention (fused qkv projection); otherwise
    cross-attention over z. `attn` selects and parameterizes the method.
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    kv_dim: Optional[int] = None
    attn: AttnConfig = AttnConfig()
    dtype: jnp.dtype = jnp.float32

    @property
    def selfatt(self):
        return self.kv_dim is None

    def _tau(self):
        if self.attn.softmax == "adjustable":
            return self.param("tau", nn.initializers.ones, (1,)).astype(self.dtype)
        return 1.0

    @nn.compact
    def __call__(
        self,
        x,
        z=None,
        ctx: Optional[AttnContext] = None,
        deterministic: bool = True,
        return_attmap: bool = False,
    ):
        cfg = self.attn
        inner = self.dim_head * self.heads
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        scale = self.dim_head**-0.5
        tau = self._tau()
        dense = functools.partial(
            nn.Dense, use_bias=cfg.use_bias, dtype=self.dtype, **jax_linear_init
        )

        if cfg.method == "repast":
            out, attn = self._repast(x, z, ctx, dense, inner, scale, tau)
            if self.dropout > 0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        else:
            # --- additive / FiLM input conditioning ------------------------
            if cfg.method == "ape":
                x, z = self._ape(x, z, ctx)
            elif cfg.method == "mln":
                x, z = self._mln(x, z, ctx)

            # --- projections ----------------------------------------------
            if z is None:
                qkv = dense(3 * inner, name="to_qkv")(x)
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = dense(inner, name="to_q")(x)
                kv = dense(2 * inner, name="to_kv")(z)
                k, v = jnp.split(kv, 2, axis=-1)
            q, k, v = (_split_heads(t, self.heads) for t in (q, k, v))

            # --- learned-rep bias concat (rpe / invatt_directsum) ---------
            if cfg.rpe:
                q, k, v = self._concat_rpe_bias(q, k, v)

            if cfg.method == "gta":
                out, attn = self._gta(q, k, v, ctx, scale, tau)
            else:
                bias = None
                if cfg.method == "gbt":
                    w = self.param("geo_weights", nn.initializers.ones, (1,))
                    bias = -((w**2) * ctx.plucker_dist)[:, None]
                out, attn = dot_product_attention(
                    q, k, v, scale=scale, tau=tau, bias=bias, flash=cfg.flash
                )

            out = _merge_heads(out)
            if project_out:
                out = dense(self.dim, use_bias=True, name="to_out")(out)
                if self.dropout > 0:
                    out = nn.Dropout(self.dropout)(out, deterministic=deterministic)

        if return_attmap:
            return out, attn
        return out

    # ------------------------------------------------------------------
    # method implementations
    # ------------------------------------------------------------------

    def _gta(self, q, k, v, ctx, scale, tau):
        cfg = self.attn
        args = cfg.gta
        if args.elementwise_mul:
            # learned projection of flattened reps to per-channel multipliers
            rep_to_vec = nn.Dense(self.dim_head, dtype=self.dtype, name="rep_to_vec")
            vec_q = rep_to_vec(ctx.geom.flat_q.astype(self.dtype))
            vec_k = rep_to_vec(ctx.geom.flat_k.astype(self.dtype))
            vec_q_inv = rep_to_vec(ctx.geom.flat_q_inv.astype(self.dtype))
            attn_fn = functools.partial(dot_product_attention, scale=scale, tau=tau)
            return vecrep_attention(q, k, v, attn_fn, vec_q, vec_k, vec_q_inv)

        trans_coeff = None
        if args.f_dims.se3 > 0:
            trans_coeff = self.param(
                "trans_coeff", nn.initializers.constant(0.01), (1,)
            ).astype(self.dtype)
        if cfg.ring and isinstance(tau, (int, float)):
            # sequence-parallel ring over the `seq` mesh axis: encoder
            # tokens view-sharded, decoder input-view KV ringed
            # (parallel/ring.py; enabled by train.py --n-seq)
            from gta_tpu.parallel.ring import ring_gta_sharded

            out = ring_gta_sharded(
                q, k, v, ctx.geom, args, trans_coeff,
                float(scale) / float(tau), self_att=self.selfatt,
            )
            return out, None
        if cfg.fused and not args.euclid_sim and isinstance(tau, (int, float)):
            # single fused Pallas kernel: rep-transform + blockwise attention
            # + inverse rep (ops/gta_pallas.py); under TP the heads shard
            # over the model axis via shard_map (parallel/tp.py — GSPMD
            # cannot partition a pallas custom call by itself)
            from gta_tpu.parallel.tp import fused_gta_attention_tp

            out = fused_gta_attention_tp(
                q, k, v, ctx.geom, args, trans_coeff, float(scale) / float(tau)
            )
            return out, None
        if args.euclid_sim:
            attn_fn = functools.partial(euclid_attention, scale=scale, tau=tau)
        else:
            attn_fn = functools.partial(
                dot_product_attention, scale=scale, tau=tau, flash=cfg.flash
            )
        return gta_attention(q, k, v, attn_fn, ctx.geom, args, trans_coeff)

    def _concat_rpe_bias(self, q, k, v):
        """Identity-initialized learnable per-head rep vectors appended to
        q/k/v channels (reference layers.py:257-264, 397-407)."""
        so2 = self.attn.rpe_so2

        def init(key, shape, dtype=jnp.float32):
            eye4 = jnp.eye(4).reshape(-1)  # 16
            eye2col = jnp.tile(jnp.asarray([1.0, 0.0]), (so2 * 2,))  # so2*4
            base = jnp.concatenate([eye4, eye2col])
            return jnp.tile(base[None], (self.heads, 1))

        rdim = 16 + so2 * 4
        outs = []
        for name, t in (("q_bias", q), ("k_bias", k), ("v_bias", v)):
            b = self.param(name, init, (self.heads, rdim)).astype(self.dtype)
            b = jnp.broadcast_to(
                b[None, :, None], (t.shape[0], self.heads, t.shape[2], rdim)
            )
            outs.append(jnp.concatenate([t, b], -1))
        return tuple(outs)

    def _ape(self, x, z, ctx):
        """Additive camera+coord embedding (reference layers.py:348-366)."""
        E = ctx.input_coord_emb.shape[-1] + 16

        def emb_of(coord_emb, transforms):
            B, N, T, _ = coord_emb.shape
            C = transforms.reshape(B, N, 1, 16)
            C = jnp.broadcast_to(C, (B, N, T, 16))
            return jnp.concatenate([C, coord_emb], -1).reshape(B, N * T, E)

        if z is not None:
            q_emb = emb_of(ctx.target_coord_emb, ctx.target_transforms)
            k_emb = emb_of(ctx.input_coord_emb, ctx.input_transforms)
            x = x + nn.Dense(self.dim, dtype=self.dtype, name="linear_q")(q_emb.astype(self.dtype))
            z = z + nn.Dense(self.kv_dim, dtype=self.dtype, name="linear_k")(k_emb.astype(self.dtype))
        else:
            emb = emb_of(ctx.input_coord_emb, ctx.input_transforms)
            x = x + nn.Dense(self.dim, dtype=self.dtype, name="linear")(emb.astype(self.dtype))
        return x, z

    def _mln(self, x, z, ctx):
        """FiLM modulation by inverse camera + coord embedding
        (reference layers.py:367-385)."""
        from gta_tpu.geometry.se3 import se3_inverse

        E = ctx.input_coord_emb.shape[-1] + 16

        def emb_of(coord_emb, transforms, invert):
            # the reference inverts the camera matrices ONLY on the
            # cross-attention path (layers.py:372-374); self-attention uses
            # them as-is (layers.py:382-383)
            B, N, T, _ = coord_emb.shape
            mats = se3_inverse(transforms) if invert else transforms
            C = mats.reshape(B, N, 1, 16)
            C = jnp.broadcast_to(C, (B, N, T, 16))
            return jnp.concatenate([C, coord_emb], -1).reshape(B, N * T, E)

        if z is not None:
            q_emb = emb_of(ctx.target_coord_emb, ctx.target_transforms, True).astype(self.dtype)
            k_emb = emb_of(ctx.input_coord_emb, ctx.input_transforms, True).astype(self.dtype)
            x = (
                nn.Dense(self.dim, dtype=self.dtype, name="linear_q_g")(q_emb) * x
                + nn.Dense(self.dim, dtype=self.dtype, name="linear_q_b")(q_emb)
            )
            z = (
                nn.Dense(self.kv_dim, dtype=self.dtype, name="linear_k_g")(k_emb) * z
                + nn.Dense(self.kv_dim, dtype=self.dtype, name="linear_k_b")(k_emb)
            )
        else:
            emb = emb_of(ctx.input_coord_emb, ctx.input_transforms, False).astype(self.dtype)
            x = (
                nn.Dense(self.dim, dtype=self.dtype, name="linear_g")(emb) * x
                + nn.Dense(self.dim, dtype=self.dtype, name="linear_b")(emb)
            )
        return x, z

    def _repast(self, x, z, ctx, dense, inner, scale, tau):
        """Relative-pose attention: queries augmented per key view with
        rays re-expressed in each key view's camera frame
        (reference layers.py:294-346)."""
        cfg = self.attn
        kv_dim = self.kv_dim if self.kv_dim is not None else self.dim

        q = x
        if q.ndim == 4:
            q_is_aug = True
            B, Tq, Nk = q.shape[:3]
        else:
            q_is_aug = False
            q_ray = ctx.query_ray_emb  # [B, Tq, Nk, E]
            B, Tq, Nk = q_ray.shape[:3]
            q = jnp.broadcast_to(q[:, :, None], (B, Tq, Nk, q.shape[-1]))
            q = jnp.concatenate([q, q_ray.astype(q.dtype)], -1)

        kv = x if z is None else z
        if kv.ndim == 4:
            assert z is not None
            k_in = v_in = kv
        else:
            k_ray = ctx.key_ray_emb  # [B, Nk, Lk, E]
            k_in = kv.reshape(*k_ray.shape[:-1], -1)
            k_in = jnp.concatenate([k_in, k_ray.astype(k_in.dtype)], -1)
            if cfg.v_bias:
                v_in = k_in.reshape(kv.shape[0], kv.shape[1], -1)
            else:
                v_in = kv

        q = dense(inner, name="to_q")(q)  # [B, Tq, Nk, inner]
        k = dense(inner, name="to_k")(k_in)  # [B, Nk, Lk, inner]
        v = dense(inner, name="to_v")(v_in)  # [B, Tk, inner]

        H = self.heads
        q = q.reshape(*q.shape[:-1], H, inner // H)
        k = k.reshape(*k.shape[:-1], H, inner // H)
        q = jnp.moveaxis(q, -2, 1)  # [B, H, Tq, Nk, C]
        k = jnp.moveaxis(k, -2, 1)  # [B, H, Nk, Lk, C]
        v = _split_heads(v, H)  # [B, H, Tk, C]

        sim = jnp.einsum("bhtnc,bhnlc->bhtnl", q, k).reshape(B, H, Tq, -1)
        if cfg.enable_scale:
            sim = sim * scale
        attn = jax.nn.softmax((sim / tau).astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = _merge_heads(out)
        if q_is_aug:
            out = jnp.broadcast_to(out[:, :, None], (B, Tq, Nk, out.shape[-1]))
        out = dense(self.dim, use_bias=True, name="to_out")(out)
        return out, attn


class Transformer(nn.Module):
    """Pre-LN ViT-style stack: x += attn(LN(x), z); x += ff(LN(x)).

    z (cross-attention memory) is intentionally *not* normalized, matching
    reference layers.py:146-154/475-488.
    """

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    kv_dim: Optional[int] = None
    attn: AttnConfig = AttnConfig()
    return_last_attmap: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z=None, ctx: Optional[AttnContext] = None, deterministic: bool = True):
        attmap = None
        for i in range(self.depth):
            last = i == self.depth - 1
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_attn_{i}")(x)
            block = Attention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                kv_dim=self.kv_dim,
                attn=self.attn,
                dtype=self.dtype,
                name=f"attn_{i}",
            )
            if last and self.return_last_attmap:
                out, attmap = block(h, z=z, ctx=ctx, deterministic=deterministic, return_attmap=True)
            else:
                out = block(h, z=z, ctx=ctx, deterministic=deterministic)
            x = x + out
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_ff_{i}")(x)
            x = x + FeedForward(
                self.dim, self.mlp_dim, self.dropout, dtype=self.dtype, name=f"ff_{i}"
            )(h, deterministic=deterministic)

        if self.return_last_attmap:
            return x, attmap
        return x
