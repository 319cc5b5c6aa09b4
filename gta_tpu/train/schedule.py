"""LR schedule: linear warmup then exponential decay.

lr(it) = peak * it/peak_it               (it < peak_it)
       = peak * decay_rate^((it-peak_it)/decay_it)   otherwise
(reference train.py:22-35; decay_rate 0.16.)
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_exp_decay(peak_lr: float, peak_it: int, decay_it: int, decay_rate: float = 0.16):
    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        warm = peak_lr * it / max(peak_it, 1)
        decay = peak_lr * decay_rate ** ((it - peak_it) / decay_it)
        return jnp.where(it < peak_it, warm, decay)

    return schedule
