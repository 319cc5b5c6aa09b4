#!/usr/bin/env python
"""Numerical parity + microbenchmark: Pallas flash attention vs XLA attention.

Runs on real TPU (Pallas kernels don't execute on the CPU test backend).
Checks fwd outputs and input gradients at the framework's real shapes
(CLEVR-TR encoder 600x600, decoder 2560x600; MSN encoder 1280x1280,
decoder 2560x1280), then times both paths.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gta_tpu.ops.attention import dot_product_attention
from gta_tpu.ops.flash import flash_attention

SHAPES = [
    # (name, B, H, Tq, Tk, C)
    ("clevr_enc", 8, 6, 600, 600, 64),
    ("clevr_dec", 8, 6, 2559, 600, 64),
    ("msn_enc", 4, 8, 1280, 1280, 96),
    ("msn_dec", 4, 8, 2560, 1280, 96),
]


def main():
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    assert jax.default_backend() == "tpu", "flash parity check needs a TPU"
    rng = np.random.RandomState(0)
    scale = 1 / 8.0

    for name, B, H, Tq, Tk, C in SHAPES:
        q = jnp.asarray(rng.randn(B, H, Tq, C).astype(np.float32) * 0.5)
        k = jnp.asarray(rng.randn(B, H, Tk, C).astype(np.float32) * 0.5)
        v = jnp.asarray(rng.randn(B, H, Tk, C).astype(np.float32) * 0.5)

        ref_fn = jax.jit(lambda q, k, v: dot_product_attention(q, k, v, scale=scale)[0])
        fl_fn = jax.jit(lambda q, k, v: flash_attention(q, k, v, sm_scale=scale))

        ref = np.asarray(ref_fn(q, k, v))
        fl = np.asarray(fl_fn(q, k, v))
        # float64 host ground truth: both device paths run bf16 MXU matmuls,
        # so compare each against the true answer rather than each other
        qn, kn, vn = (np.asarray(x, np.float64) for x in (q, k, v))
        sim = np.einsum("bhqc,bhkc->bhqk", qn, kn) * scale
        p = np.exp(sim - sim.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        gt = np.einsum("bhqk,bhkc->bhqc", p, vn)
        err_ref = np.abs(ref - gt).max()
        err = np.abs(fl - gt).max()

        # gradient parity
        def loss_ref(q, k, v):
            return jnp.sum(dot_product_attention(q, k, v, scale=scale)[0] ** 2)

        def loss_fl(q, k, v):
            return jnp.sum(flash_attention(q, k, v, sm_scale=scale) ** 2)

        g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
        g_fl = jax.jit(jax.grad(loss_fl, argnums=(0, 1, 2)))(q, k, v)
        gerr = max(
            float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-6))
            for a, b in zip(g_ref, g_fl)
        )

        def timeit(f, iters=20):
            # chain outputs into the next call's q and host-fetch once:
            # per-call block_until_ready is unreliable over tunneled devices
            x = f(q, k, v)
            float(x[0, 0, 0, 0])
            t0 = time.perf_counter()
            for _ in range(iters):
                x = f(x, k, v)
            float(x[0, 0, 0, 0])
            return (time.perf_counter() - t0) / iters * 1e3

        t_ref, t_fl = timeit(ref_fn), timeit(fl_fn)
        # flash must be at least as accurate as the XLA path (2x slack) and
        # gradients must agree between the two device paths
        status = "OK" if err < max(2.0 * err_ref, 1e-4) and gerr < 5e-3 else "FAIL"
        print(
            f"{name:10s} [{status}] fwd_err={err:.2e} (xla {err_ref:.2e}) "
            f"grad_rel_err={gerr:.2e} "
            f"xla={t_ref:.2f}ms flash={t_fl:.2f}ms speedup={t_ref / t_fl:.2f}x"
        )
        assert status == "OK", f"{name} parity failure"


if __name__ == "__main__":
    main()
