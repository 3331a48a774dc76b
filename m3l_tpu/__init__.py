"""m3l_tpu — TPU-native visuo-tactile representation-learning + RL framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the M3L
reference codebase (visuo-tactile masked autoencoders + PPO/SAC, the Sparsh
tactile-SSL suite, downstream tactile probes and evaluation harness),
re-designed TPU-first:

* all compute paths are pure functions compiled with ``jax.jit``,
* static shapes everywhere (mask gathers are config-determined),
* multi-chip scaling via ``jax.sharding.Mesh`` + NamedSharding (GSPMD),
* bfloat16 matmuls on the MXU with float32 parameters/accumulation,
* host-side vectorized environment pool feeding batched device inference.

Package layout:
  ops/     stateless array ops: positional tables, patchify, masking, attention
  nn/      neural building blocks (flax.nnx modules)
  models/  representation models: VTT, VTMAE, ViT zoo, multimodal transformer
  rl/      PPO-MAE / SAC-MAE algorithms, policies, buffers, GAE, vecnorm
  ssl/     self-supervised algorithms: MAE, DINO, DINOv2(+iBOT/KoLeo), I-JEPA, V-JEPA
  envs/    env factory + observation wrappers + fake envs for testing
  train/   trainer loop, mesh/sharding utilities, checkpointing (orbax)
  tasks/   downstream probes (force/slip/pose/grasp/textile/force-field)
  data/    offline dataset loaders + input pipeline
  eval/    TacBench-style evaluation harness
  cli/     flag-compatible entry points (train, train_sacmae, traindino, ...)
"""

__version__ = "0.1.0"
