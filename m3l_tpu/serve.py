"""Serving/export: AOT-compiled StableHLO artifacts for trained models.

No reference counterpart — the reference's only deployment story is
re-running the torch module in-process (its live demo,
tactile_ssl/test/demo_t1_forcefield.py:24-182). This is a TPU-native bonus
capability: a trained policy or encoder exports to a self-contained,
versioned StableHLO artifact (``jax.export``) that any matching JAX runtime
can execute with NO model code, checkpoint machinery, or Python class
definitions — the deployment contract XLA-based serving stacks expect.

Design notes (TPU):

* **Static shapes.** One artifact per (batch, obs-space) signature — XLA
  serving wants fixed shapes. Export batch 1 for per-step policy serving
  and the scoring batch for offline evaluation; artifacts are cheap.
* **Weights are baked in as constants** (self-contained artifact): callers
  pass example observations only. A flagship policy (dim 256) serializes
  to ~30-60 MB.
* **Platform set is chosen at export.** ``platforms=("tpu",)`` works from
  any host — StableHLO lowering (including mosaic lowering of the pallas
  flash-attention kernel) happens host-side without a chip. Use
  ``("cpu",)`` for hardware-free round-trip tests. The pallas path is only
  traced when the exporting process is TPU-backed
  (nn/flash_attention.use_flash); CPU-hosted exports trace the einsum
  attention path — identical numerics, and at serving sequence lengths
  (<=192 tokens) equivalent speed.
* Artifacts record the jax.export calling convention version and refuse to
  load under an incompatible runtime — the versioning story checkpoints
  never give you.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

__all__ = [
    "export_fn",
    "export_policy",
    "export_encoder",
    "save_artifact",
    "load_artifact",
]


def export_fn(fn, example_args: tuple, platforms: tuple[str, ...] | None = None) -> bytes:
    """Serialize ``jit(fn)`` at the example argument signature to a
    StableHLO artifact (bytes). ``platforms=None`` lowers for the current
    backend only."""
    from jax import export as jexport

    exp = jexport.export(jax.jit(fn), platforms=list(platforms) if platforms else None)(*example_args)
    return exp.serialize()


def export_policy(
    policy,
    example_obs: dict,
    *,
    deterministic: bool = True,
    action_low=None,
    action_high=None,
    platforms: tuple[str, ...] | None = None,
) -> bytes:
    """Export an ActorCritic as an action server.

    The artifact computes ``obs -> actions`` from RAW environment
    observations (uint8 image (B, fs, H, W, 3), float tactile
    (B, fs, 6, h, w)) — vt_load packing, feature extraction, and the policy
    head are all inside the exported program, so the serving host needs no
    m3l_tpu code at all. ``deterministic=True`` serves the Gaussian mean
    (SB3 ``predict(deterministic=True)`` parity); otherwise the artifact
    takes ``(obs, key)`` and samples. Optional action bounds are baked in
    as a final clip (PPOMAE.predict parity, rl/ppo_mae.py:436-442).
    """
    graphdef, state = nnx.split(policy)
    lo = None if action_low is None else jnp.asarray(action_low, jnp.float32)
    hi = None if action_high is None else jnp.asarray(action_high, jnp.float32)

    def _clip(a):
        return jnp.clip(a, lo, hi) if lo is not None and hi is not None else a

    if deterministic:

        def serve(obs):
            m = nnx.merge(graphdef, state)
            mean, _, _ = m._dist_params(obs)
            return _clip(mean)

        return export_fn(serve, (example_obs,), platforms)

    def serve(obs, key):
        m = nnx.merge(graphdef, state)
        actions, _, _ = m.step(obs, key)
        return _clip(actions)

    return export_fn(serve, (example_obs, jax.random.PRNGKey(0)), platforms)


def export_encoder(features, example_obs: dict, platforms: tuple[str, ...] | None = None) -> bytes:
    """Export a feature extractor (MAEFeatures or any nnx module mapping a
    raw obs dict to embeddings) as ``obs -> features`` — the SSL
    representation as a service, e.g. for downstream probes that train
    against a frozen deployed encoder."""
    graphdef, state = nnx.split(features)

    def serve(obs):
        return nnx.merge(graphdef, state)(obs)

    return export_fn(serve, (example_obs,), platforms)


def save_artifact(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


def load_artifact(path: str):
    """Deserialize an exported artifact; returns the ``jax.export.Exported``
    — run it with ``.call(*args)`` (jittable, differentiable-if-exported-
    with-VJP, shardable like any JAX computation)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def example_obs_for(env_like, batch: int = 1, frame_stack: int = 1) -> dict:
    """Zero-filled raw observations matching an env's observation space —
    the export signature helper (shapes/dtypes only; values don't matter)."""
    out = {}
    for k, space in env_like.observation_space.spaces.items():
        out[k] = np.zeros((batch, *space.shape), dtype=space.dtype)
    return out
