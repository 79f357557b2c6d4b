"""unified_video_action_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the UVA ("Unified Video Action Model") reference implementation.

Built from scratch for TPU: functional models over pytrees (flax.linen), explicit RNG
threading, every hot loop jit-compiled with static shapes (diffusion samplers are
`lax.scan` bodies), SPMD scale-out via `jax.sharding.Mesh` + XLA collectives, and
Pallas kernels for the hot ops (flash attention, fused AdaLN diffusion MLP).

Capability map vs the reference (see SURVEY.md for file:line citations):
  models/    — KL-VAE tokenizer, MAR unified transformer, DiffLoss/DiffActLoss heads,
               IDDPM gaussian-diffusion library, EMA
  policy/    — UnifiedVideoActionPolicy (predict_action / compute_loss)
  data/      — replay buffer, sequence sampler, normalizers, datasets
  training/  — train loop, optimizer, LR schedules, checkpointing
  envs/      — PushT (from-scratch 2D physics), vectorization wrappers
  runners/   — env rollout evaluation harness
  eval/      — FVD / action-L2 offline metrics
  parallel/  — mesh construction, sharding rules (DP + ZeRO-style opt sharding)
  ops/       — Pallas TPU kernels
  serving/   — ZMQ policy inference server
"""

__version__ = "0.1.0"
