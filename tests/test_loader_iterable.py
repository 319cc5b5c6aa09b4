"""Loader over iterable (MSN-style) datasets."""

import numpy as np

from gta_tpu.config import DataConfig
from gta_tpu.data.loader import Loader
from gta_tpu.data.synthetic import SyntheticScenes


class FakeIterable:
    """Iterable dataset (no __getitem__) yielding synthetic items."""

    def __init__(self, n):
        self.n = n
        cfg = DataConfig(dataset="synthetic", num_points=30, height=16, width=16,
                         downsample=0, downsample_input_coord=2,
                         num_input_views=2, num_target_views=2, num_views=4)
        self._ds = SyntheticScenes(cfg, "train", num_scenes=n)

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            yield self._ds[i]


def test_iterable_batching_and_drop_last():
    loader = Loader(FakeIterable(10), batch_size=4, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].input_images.shape[0] == 4
    ids = np.concatenate([np.asarray(b.sceneid) for b in batches])
    assert sorted(ids.tolist()) == list(range(8))


def test_iterable_keep_last():
    loader = Loader(FakeIterable(10), batch_size=4, drop_last=False)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1].input_images.shape[0] == 2


def test_msn_stream_skip_applies_to_first_epoch_only():
    """skip(n) after a checkpoint resume must drop items from the FIRST
    epoch only; later epochs replay the full shard (a sticky skip would
    permanently starve the head of the stream)."""
    import tensorflow as tf

    from gta_tpu.data.msn import MultiShapeNet

    ds = object.__new__(MultiShapeNet)
    ds.cfg = None
    ds.mode = "train"
    ds.shuffle = None
    ds.seed = 0
    ds._skip = 0
    ds.prep_workers = 2
    ds.num_items = 8
    ds.tf_dataset = tf.data.Dataset.range(8)
    ds._prep = lambda i, data: (i, int(data))

    ds.skip(3)
    first = list(ds)
    second = list(ds)
    # first epoch: items 3..7, with stream positions continuing from 3
    assert first == [(3 + j, 3 + j) for j in range(5)]
    # second epoch: full stream again, positions restart at 0
    assert second == [(j, j) for j in range(8)]
