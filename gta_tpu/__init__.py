"""gta-tpu: a TPU-native geometric multi-view transformer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
autonomousvision/gta (ICLR 2024, "GTA: A Geometry-Aware Attention Mechanism
for Multi-View Transformers"): SRT-style novel-view-synthesis encoder/decoder
models whose attention applies per-token group-representation matrices
(SE(3), SO(2) rotary, SO(3) Wigner-D, T(2)) to Q/K/V inside attention.

Layering (bottom-up):
  geometry/   pure-JAX group math: rotors, rigid transforms, Wigner-D, rays
  ops/        attention kernels: reference-form einsum GTA + fused Pallas GTA
  models/     flax.linen model stack (conv stem, transformer, encoder/decoder)
  data/       per-host sharded input pipelines (synthetic, CLEVR-TR, MSN)
  parallel/   jax.sharding mesh utilities and collectives
  train/      jit train loop, optax schedule, orbax checkpointing
  utils/      metrics, visualization
"""

__version__ = "0.1.0"
