"""Class-conditional image datasets for the DiT-2DGTA family.

The target dataset is ImageNet (BASELINE.json "ImageNet DiT generation
with 2D GTA"); this environment has no ImageNet copy, so the family ships
with a hermetic procedural dataset that exercises the identical pipeline
(label-conditional [-1, 1] NHWC images) and a gated TFDS path for real
ImageNet when a data directory is available.

Procedural classes are structurally distinct (oriented stripes whose
frequency/orientation are class functions, with per-sample phase, color,
and noise), so a class-conditional model measurably learns p(x|y) — loss
separates from the unconditional fit within a few hundred steps.
"""

from __future__ import annotations

import numpy as np


class SyntheticImages:
    """Map-style procedural dataset: items {'image': [H,W,3] in [-1,1] fp32,
    'label': int32}."""

    def __init__(
        self,
        size: int = 32,
        num_classes: int = 10,
        mode: str = "train",
        num_images: int = 50000,
        seed: int = 0,
    ):
        self.size = size
        self.num_classes = num_classes
        self.num_images = num_images
        base = {"train": 0, "val": 1 << 24, "test": 1 << 25}[mode]
        self.seed_base = seed * (1 << 26) + base

    def __len__(self):
        return self.num_images

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.RandomState(self.seed_base + idx)
        k = int(rng.randint(self.num_classes))
        s = self.size
        yy, xx = np.meshgrid(
            np.linspace(0, 1, s, dtype=np.float32),
            np.linspace(0, 1, s, dtype=np.float32),
            indexing="ij",
        )
        # class-determined orientation + frequency; sample-determined phase
        angle = np.pi * k / self.num_classes
        freq = 2.0 + 2.0 * (k % 5)
        phase = rng.uniform(0, 2 * np.pi)
        wave = np.sin(
            2 * np.pi * freq * (np.cos(angle) * xx + np.sin(angle) * yy) + phase
        )
        color = rng.uniform(0.3, 1.0, size=(3,)).astype(np.float32)
        img = wave[..., None] * color[None, None]
        img += rng.normal(scale=0.05, size=img.shape)
        return {
            "image": np.clip(img, -1.0, 1.0).astype(np.float32),
            "label": np.int32(k),
        }


def collate_images(items) -> dict:
    return {
        "image": np.stack([it["image"] for it in items]),
        "label": np.stack([it["label"] for it in items]),
    }


class ImageNetTFDS:
    """Gated TFDS imagenet2012 stream (requires a prepared data_dir).

    Yields center-cropped, resized [-1, 1] images. Latent-space DiT
    additionally needs a VAE; this family trains in pixel space until VAE
    weights are vendored (documented in docs/PARITY.md).
    """

    def __init__(self, size: int, mode: str, data_dir: str, shuffle: int = 10000):
        try:
            import tensorflow as tf
            import tensorflow_datasets as tfds
        except Exception as e:  # pragma: no cover - env without TF
            raise RuntimeError(f"tensorflow_datasets unavailable: {e}")
        tf.config.set_visible_devices([], "GPU")
        split = {"train": "train", "val": "validation", "test": "validation"}[mode]
        self._ds = tfds.load("imagenet2012", split=split, data_dir=data_dir)
        if mode == "train" and shuffle:
            self._ds = self._ds.shuffle(shuffle)
        self.size = size

    def __iter__(self):
        import tensorflow as tf

        for ex in self._ds.as_numpy_iterator():
            img = ex["image"]
            h, w = img.shape[:2]
            c = min(h, w)
            img = img[(h - c) // 2 : (h + c) // 2, (w - c) // 2 : (w + c) // 2]
            img = tf.image.resize(img, (self.size, self.size), antialias=True).numpy()
            yield {
                "image": (img / 127.5 - 1.0).astype(np.float32),
                "label": np.int32(ex["label"]),
            }


class DeviceSyntheticImages:
    """On-device procedural image generation (the DiT analogue of
    data/device_synth.py): the same class-conditional stripe distribution as
    SyntheticImages, generated inside one jit so training needs no
    steady-state host->device transfer (the tunneled chip ingests ~5.5 MB/s,
    which starves even small-image diffusion batches)."""

    def __init__(self, size: int = 32, num_classes: int = 10, mode: str = "train",
                 num_images: int = 50000, seed: int = 0):
        import jax
        import jax.numpy as jnp

        self.size = size
        self.num_classes = num_classes
        self.num_images = num_images
        base = {"train": 0, "val": 1 << 24, "test": 1 << 25}[mode]
        self.id_base = base
        self.key = jax.random.PRNGKey(seed * (1 << 26) + base + 23)
        s = size
        yy, xx = np.meshgrid(
            np.linspace(0, 1, s, dtype=np.float32),
            np.linspace(0, 1, s, dtype=np.float32),
            indexing="ij",
        )
        xx, yy = jnp.asarray(xx), jnp.asarray(yy)

        def gen_one(sid):
            key = jax.random.fold_in(self.key, sid)
            kk, kp, kc, kn = jax.random.split(key, 4)
            k = jax.random.randint(kk, (), 0, num_classes)
            angle = jnp.pi * k / num_classes
            freq = 2.0 + 2.0 * (k % 5)
            phase = jax.random.uniform(kp, (), minval=0.0, maxval=2 * jnp.pi)
            wave = jnp.sin(
                2 * jnp.pi * freq * (jnp.cos(angle) * xx + jnp.sin(angle) * yy) + phase
            )
            color = jax.random.uniform(kc, (3,), minval=0.3, maxval=1.0)
            img = wave[..., None] * color[None, None]
            img = img + 0.05 * jax.random.normal(kn, img.shape)
            return {
                "image": jnp.clip(img, -1.0, 1.0).astype(jnp.float32),
                "label": k.astype(jnp.int32),
            }

        self._gen = jax.jit(jax.vmap(gen_one))

    def batch(self, step: int, batch_size: int, shard_index: int = 0,
              shard_count: int = 1) -> dict:
        import jax.numpy as jnp

        start = (step * shard_count + shard_index) * batch_size
        if self.id_base:  # val/test cycle a fixed id range
            start %= 1 << 20
        ids = jnp.arange(start, start + batch_size) + self.id_base
        return self._gen(ids)

    def val_batches(self, num_scenes: int, batch_size: int):
        n = max(1, num_scenes // batch_size)
        return [self.batch(i, batch_size) for i in range(n)]
