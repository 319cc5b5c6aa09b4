"""jit-compiled training/eval runtime (reference trainer.py analogue).

One fused train step: loss (pixel MSE, fp32) -> grad -> AdamW update, all
inside a single jit with donated state. Data parallelism comes from
sharding annotations (parallel/mesh.py) — XLA inserts the gradient
all-reduce. Mixed precision is a compute-dtype policy (params fp32,
matmuls bf16) instead of autocast.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from gta_tpu.config import Config
from gta_tpu.geometry.coords import make_2dcoord
from gta_tpu.models.context import SceneBatch
from gta_tpu.models.srt import build_model
from gta_tpu.train.schedule import warmup_exp_decay
from gta_tpu.utils.metrics import mse2psnr


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


class Trainer:
    """Owns the model, optimizer, and compiled step functions."""

    def __init__(self, cfg: Config, mesh=None):
        t = cfg.training
        # 'auto' resolves to the fused path on TPU: the single-pass flash
        # core + fused recompute backward (ops/flash_core.py) beats the XLA
        # einsum path on the full flagship train step (v5e, interleaved
        # chained timing: 26.0 vs 29.2 ms at batch 8, 121.1 vs 129.6 ms at
        # batch 32, fp32). 'off' keeps the XLA einsum path (also the CPU
        # default — Pallas interpret mode is for parity tests, not speed).
        flash_mode = t.flash
        if flash_mode == "auto":
            flash_mode = "fused" if jax.default_backend() == "tpu" else "off"
        if flash_mode in ("on", "fused"):
            from gta_tpu.config import with_flash_attention

            cfg = with_flash_attention(cfg, fused=flash_mode == "fused")
        self.cfg = cfg
        self.dtype = jnp.bfloat16 if t.mixed_prec else jnp.float32
        self.model = build_model(cfg.model, dtype=self.dtype)
        self.schedule = warmup_exp_decay(t.lr, t.lr_warmup, t.decay_it, t.decay_rate)
        if t.noadamW:
            self.tx = optax.adam(self.schedule)
        else:
            self.tx = optax.adamw(self.schedule, weight_decay=t.weight_decay)
        self.mesh = mesh
        # Set by enable_zero1(): {params, opt_state} NamedSharding pytrees
        # re-asserted inside the train step so the ZeRO-1 layout is pinned
        # across iterations (otherwise GSPMD may propagate the moment
        # shardings into the updated params and silently de-replicate them).
        self._state_constraints = None
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)
        # jitted init: eager flax init dispatches thousands of ops (minutes
        # over a tunneled device) and can't hit the persistent compile cache
        self._init = jax.jit(
            lambda rng, batch: self.model.init(rng, batch, deterministic=True)
        )
        self._encode = jax.jit(
            lambda params, batch: self.model.apply(
                params, batch, deterministic=True, method=self.model.encode
            )
        )
        self._decode_chunk = jax.jit(self._decode_chunk_impl)

    # ------------------------------------------------------------------
    def init_state(self, batch: SceneBatch, seed: int = 0) -> TrainState:
        params = self._init(jax.random.PRNGKey(seed), batch)
        opt_state = self.tx.init(params)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)

    def enable_zero1(self, state: TrainState, mesh, tp: bool = False) -> TrainState:
        """ZeRO-1: shard the optimizer state over the data axis (params stay
        replicated, or TP-sharded when tp=True). Returns the re-placed state;
        must be called before the first train_step so the constraint closure
        is captured at trace time. See parallel/zero.py."""
        from gta_tpu.parallel.mesh import replicated
        from gta_tpu.parallel.tp import param_shardings
        from gta_tpu.parallel.zero import opt_state_shardings

        if tp:
            p_sh = param_shardings(state.params, mesh)
        else:
            p_sh = jax.tree.map(lambda _: replicated(mesh), state.params)
        o_sh = opt_state_shardings(state.opt_state, mesh, tp=tp)
        self._state_constraints = {"params": p_sh, "opt_state": o_sh}
        return state.replace(
            params=jax.tree.map(jax.device_put, state.params, p_sh),
            opt_state=jax.tree.map(jax.device_put, state.opt_state, o_sh),
        )

    def param_counts(self, state: TrainState) -> Dict[str, int]:
        def count(tree):
            return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

        p = state.params["params"]
        return {
            "encoder": count(p.get("encoder", {})),
            "decoder": count(p.get("decoder", {})),
            "total": count(p),
        }

    # ------------------------------------------------------------------
    def _loss_fn(self, params, batch: SceneBatch, rng):
        pred, _ = self.model.apply(
            params, batch, deterministic=False, rngs={"dropout": rng}
        )
        target = batch.target_pixels.reshape(batch.target_pixels.shape[0], -1, 3)
        pred = pred.astype(jnp.float32)
        # per-item MSE over views+points, then batch mean (trainer.py:119-121)
        mse = jnp.mean((pred - target) ** 2, axis=(1, 2))
        return jnp.mean(mse), mse

    def _grads_fn(self, params, batch: SceneBatch, rng):
        """value_and_grad of the loss; with training.grad_accum > 1 the batch
        is split into equal microbatches scanned inside the jit (one compiled
        body, grads averaged) so peak activation memory scales with the
        microbatch, not the global batch. Equal-size microbatches make the
        mean-of-means exactly the full-batch mean; dropout keys are folded
        per microbatch index so masks stay independent."""
        accum = self.cfg.training.grad_accum
        if accum <= 1:
            return jax.value_and_grad(self._loss_fn, has_aux=True)(params, batch, rng)
        b = batch.target_pixels.shape[0]
        if b % accum:
            raise ValueError(f"batch size {b} not divisible by grad_accum={accum}")

        def split(x):
            # Strided split: microbatch i takes rows i, i+accum, 2*accum+i, …
            # A contiguous block split would make each microbatch a contiguous
            # row range living on only a subset of data-axis devices, forcing
            # XLA to reshard every scan iteration under DP; the stride keeps
            # every microbatch spread over all data devices. Equal-size
            # microbatches keep mean-of-means == full-batch mean either way.
            return x.reshape((b // accum, accum) + x.shape[1:]).swapaxes(0, 1)

        micro = jax.tree.map(split, batch)

        def body(g_sum, xs):
            mb, i = xs
            (loss, mse), g = jax.value_and_grad(self._loss_fn, has_aux=True)(
                params, mb, jax.random.fold_in(rng, i)
            )
            return jax.tree.map(jnp.add, g_sum, g), (loss, mse)

        zeros = jax.tree.map(jnp.zeros_like, params)
        g_sum, (losses, mses) = jax.lax.scan(body, zeros, (micro, jnp.arange(accum)))
        grads = jax.tree.map(lambda g: g / accum, g_sum)
        return (jnp.mean(losses), mses.reshape(-1)), grads

    def _train_step_impl(self, state: TrainState, batch: SceneBatch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, mse), grads = self._grads_fn(state.params, batch, rng)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if self._state_constraints is not None:
            # ZeRO-1: moments stay data-sharded (devices update 1/N each —
            # XLA reduce-scatters the grads into the update), params are
            # re-asserted to their replicated/TP layout (XLA all-gathers the
            # delta), matching the ZeRO-1 communication pattern.
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, self._state_constraints["opt_state"]
            )
            params = jax.lax.with_sharding_constraint(
                params, self._state_constraints["params"]
            )
        metrics = {
            "loss": loss,
            "mse": jnp.mean(mse),
            "lr": self.schedule(state.step),
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    def train_step(self, state: TrainState, batch: SceneBatch, rng) -> Tuple[TrainState, Dict]:
        return self._train_step(state, batch, rng)

    # ------------------------------------------------------------------
    def _eval_step_impl(self, params, batch: SceneBatch):
        pred, _ = self.model.apply(params, batch, deterministic=True)
        target = batch.target_pixels.reshape(batch.target_pixels.shape[0], -1, 3)
        mse = jnp.mean((pred.astype(jnp.float32) - target) ** 2, axis=(1, 2))
        return {"mse": mse, "psnr": mse2psnr(mse)}

    def eval_step(self, params, batch: SceneBatch) -> Dict[str, jnp.ndarray]:
        return self._eval_step(params, batch)

    def evaluate(self, params, batches, mesh=None) -> Dict[str, float]:
        """Aggregate eval over an iterable of SceneBatch.

        mesh: shard each val batch over the data axis before the compiled
        eval step (the reference shards validation exactly like training
        via its DistributedSampler). Batches whose size does not divide the
        device count fall back to replicated execution.

        Multi-host: per-host means are all-gathered and averaged with a
        deterministic (sorted) key order — the analogue of the reference's
        AVG all_reduce over sorted keys (common.py:80-102). Host shards see
        equal batch counts (loader truncation), so mean-of-means is exact.
        Scene coverage is reported like reference trainer.py:55-58: unique
        sceneids counted over the all-gathered id set.
        """
        from gta_tpu.parallel.mesh import local_data

        acc: Dict[str, list] = {}
        sceneids: list = []
        for batch in batches:
            if batch.sceneid is not None:
                # capture BEFORE sharding: after shard_batch the ids are a
                # global array whose remote shards this host cannot fetch
                sceneids.append(np.asarray(batch.sceneid).reshape(-1))
            if mesh is not None:
                from gta_tpu.parallel.mesh import shard_batch

                n_data = mesh.shape.get("data", 1)
                local_b = batch.input_images.shape[0]
                n_local = max(1, n_data // jax.process_count())
                if local_b % n_local == 0:
                    batch = shard_batch(batch, mesh)
            out = self.eval_step(params, batch)
            for k, v in out.items():
                # fetch only this host's rows (global arrays are not
                # addressable across processes); the cross-host mean happens
                # in the allgather reduction below
                acc.setdefault(k, []).append(local_data(v))
        local = {k: float(np.mean(np.concatenate(v))) for k, v in acc.items()}
        if sceneids:
            ids = np.concatenate(sceneids)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                ids = np.asarray(multihost_utils.process_allgather(ids)).reshape(-1)
            print(f"Evaluated {len(np.unique(ids))} unique scenes.")
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            keys = sorted(local)
            vals = jnp.asarray([local[k] for k in keys])
            gathered = multihost_utils.process_allgather(vals)  # [hosts, K]
            return {k: float(v) for k, v in zip(keys, np.mean(gathered, 0))}
        return local

    # ------------------------------------------------------------------
    def _decode_chunk_impl(self, params, z, enc_geom_batch: SceneBatch):
        pixels, _ = self.model.apply(
            params,
            z,
            enc_geom_batch,
            None,
            True,
            method=self.model.decode,
        )
        return pixels

    def render_image(
        self,
        params,
        batch: SceneBatch,
        height: int,
        width: int,
        target_transform: Optional[jnp.ndarray] = None,
        chunk: int = 4096,
        mesh=None,
        rays: Optional[np.ndarray] = None,
        cam: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Full-frame render: encode once, decode rays in fixed-size chunks
        (static shapes => one compile), reference trainer.py:137-181.

        target_transform: [B, 4, 4] relative camera for the novel view
        (a canonical-frame extrinsic, i.e. canonical->view map); defaults
        to the canonical (identity) frame.

        Transform-mode models (batch.target_transforms present) receive the
        canonical view-0 ray grid plus the transform; non-transform models
        (reference clevr_tr.py:313-327 item shape) receive the *actual*
        target-view rays/positions derived from the transform, matching how
        the reference feeds them real rays at eval (trainer.py:137-181).
        """
        (z, _enc_ctx) = self._encode(params, batch)
        B = batch.input_images.shape[0]
        # Decoder rays are embarrassingly parallel (SURVEY §5.7): with a mesh,
        # shard the ray axis of each chunk over `data` devices instead of
        # looping in time, scaling the chunk so per-device work is unchanged.
        ray_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape.get("data", 1)
            # visualize() runs on process 0 only (train.py), so a global
            # mesh with non-addressable devices cannot be used here —
            # fall back to the chunk loop on multi-host meshes.
            local_only = all(
                d.process_index == jax.process_index()
                for d in mesh.devices.flat
            )
            if n_data > 1 and local_only:
                chunk = chunk * n_data
                spec = (
                    P(None, None, "data", None)
                    if batch.target_transforms is not None
                    else P(None, "data", None)
                )
                ray_sharding = NamedSharding(mesh, spec)
        coord = np.broadcast_to(
            make_2dcoord(height, width).reshape(1, -1, 2), (B, height * width, 2)
        )
        if target_transform is None:
            target_transform = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4))
        transform_mode = batch.target_transforms is not None
        if rays is not None:
            # caller-supplied ray grid (full-scale eval: `downsample` shrinks
            # only the inputs, so the native-resolution canonical grid comes
            # from the full-scale item's target_rays, not the input grid —
            # reference evaluate.py:90-94 protocol)
            rays = np.asarray(rays).reshape(B, -1, 3)
            cam = np.asarray(cam).reshape(B, -1, 3)
            if cam.shape[1] == 1:
                cam = np.broadcast_to(cam, (B, height * width, 3))
        elif transform_mode:
            # canonical grid rays + relative transform carry the view change
            rays = np.asarray(batch.input_rays[:, 0]).reshape(B, -1, 3)
            cam = np.broadcast_to(
                np.asarray(batch.input_camera_pos[:, 0])[:, None],
                (B, height * width, 3),
            )
            if rays.shape[1] != height * width:
                raise ValueError(
                    f"render_image at {height}x{width} but the canonical input "
                    f"grid has {rays.shape[1]} rays (input downsampling?) — "
                    "pass the full-scale item's target_rays/cam explicitly"
                )
        else:
            # geometry enters through the rays: build the novel view's ray
            # grid in the canonical frame from its extrinsic
            from gta_tpu.geometry.rays import camera_rays_from_extrinsic

            ext = np.asarray(target_transform)
            inv = np.linalg.inv(ext)
            cam_pos = inv[:, :3, 3]  # camera origin in canonical coords
            rays = np.stack(
                [
                    camera_rays_from_extrinsic(ext[b], cam_pos[b], width, height)
                    for b in range(B)
                ]
            ).reshape(B, -1, 3)
            cam = np.broadcast_to(cam_pos[:, None], (B, height * width, 3)).copy()

        n = height * width
        n_pad = ((n + chunk - 1) // chunk) * chunk
        pad = n_pad - n

        def pad_to(x):
            return np.concatenate([x, np.repeat(x[:, -1:], pad, 1)], 1) if pad else x

        coord, rays, cam = pad_to(coord), pad_to(rays), pad_to(cam)
        out = np.zeros((B, n_pad, 3), np.float32)

        def view_axis(x):
            """Insert the target-view axis only for transform-mode batches
            (non-transform batches are flat [B, P, ...])."""
            return x[:, None] if transform_mode else x

        def put(x):
            x = jnp.asarray(x)
            if ray_sharding is not None:
                x = jax.device_put(x, ray_sharding)
            return x

        for i in range(0, n_pad, chunk):
            sub = SceneBatch(
                input_images=batch.input_images,
                input_camera_pos=batch.input_camera_pos,
                input_rays=batch.input_rays,
                target_pixels=jnp.zeros((B, 1, chunk, 3)),
                target_camera_pos=put(view_axis(cam[:, i : i + chunk])),
                target_rays=put(view_axis(rays[:, i : i + chunk])),
                input_transforms=batch.input_transforms,
                target_transforms=(
                    jnp.asarray(target_transform)[:, None] if transform_mode else None
                ),
                input_coord=batch.input_coord,
                target_coord=(
                    put(view_axis(coord[:, i : i + chunk]))
                    if batch.target_coord is not None
                    else None
                ),
            )
            out[:, i : i + chunk] = np.asarray(self._decode_chunk(params, z, sub))
        return out[:, :n].reshape(B, height, width, 3)

    def render_rays(
        self,
        params,
        batch: SceneBatch,
        rays: np.ndarray,
        camera_pos: np.ndarray,
        chunk: int = 4096,
    ) -> np.ndarray:
        """Decode arbitrary canonical-frame rays [B, P, 3] against the
        batch's input views — the non-transform eval path (reference
        evaluate.py:122-131 feeds each target view's actual rays)."""
        (z, _enc_ctx) = self._encode(params, batch)
        B, n = rays.shape[:2]
        n_pad = ((n + chunk - 1) // chunk) * chunk
        pad = n_pad - n

        def pad_to(x):
            return np.concatenate([x, np.repeat(x[:, -1:], pad, 1)], 1) if pad else x

        rays, cam = pad_to(np.asarray(rays)), pad_to(np.asarray(camera_pos))
        out = np.zeros((B, n_pad, 3), np.float32)
        for i in range(0, n_pad, chunk):
            sub = SceneBatch(
                input_images=batch.input_images,
                input_camera_pos=batch.input_camera_pos,
                input_rays=batch.input_rays,
                target_pixels=jnp.zeros((B, chunk, 3)),
                target_camera_pos=jnp.asarray(cam[:, i : i + chunk]),
                target_rays=jnp.asarray(rays[:, i : i + chunk]),
                input_transforms=batch.input_transforms,
                input_coord=batch.input_coord,
            )
            out[:, i : i + chunk] = np.asarray(self._decode_chunk(params, z, sub))
        return out[:, :n]

    def visualize(self, params, batch: SceneBatch, out_path: str, num_angles: int = 6,
                  mesh=None):
        """Render `num_angles` novel views rotated about the world z-axis into
        an image grid (reference trainer.py:184-295). Rotation is conjugated
        into the canonical frame: T_rel = E_canon R_z(theta) E_canon^-1."""
        from gta_tpu.utils.visualize import draw_visualization_grid

        B, N, H, W = batch.input_rays.shape[:4]
        columns = [
            (f"input {i + 1}", np.asarray(batch.input_images[:, i])) for i in range(N)
        ]
        canon = np.asarray(batch.transform) if batch.transform is not None else None
        for i in range(num_angles):
            angle = i * (2 * np.pi / num_angles)
            Rz = np.asarray(
                [
                    [np.cos(angle), -np.sin(angle), 0, 0],
                    [np.sin(angle), np.cos(angle), 0, 0],
                    [0, 0, 1, 0],
                    [0, 0, 0, 1],
                ],
                dtype=np.float32,
            )
            if canon is not None:
                rel = np.einsum("bij,jk,bkl->bil", canon, Rz, np.linalg.inv(canon))
            else:
                rel = np.broadcast_to(Rz, (B, 4, 4))
            img = self.render_image(
                params, batch, H, W, target_transform=rel.astype(np.float32), mesh=mesh
            )
            columns.append((f"render {(i * 360) // num_angles}°", img))
        draw_visualization_grid(columns, out_path)
