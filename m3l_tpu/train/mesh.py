"""Device-mesh + sharding utilities (GSPMD).

The reference scales via Lightning-Fabric DDP/NCCL (reference
tactile_ssl/trainer/trainer.py:30,101-108) and SubprocVecEnv process pools;
TPU-native scaling is declarative: pick a ``jax.sharding.Mesh``, annotate
parameter and batch shardings with ``NamedSharding``, and let XLA insert the
collectives over ICI.

Axes:
* ``dp`` — data parallel: batch dimension of observations/rollouts; gradient
  all-reduce is inserted automatically by GSPMD.
* ``mp`` — tensor parallel (optional): shards transformer qkv/out and MLP
  fc1/fc2 kernels across chips Megatron-style. At M3L model sizes (dim 256)
  this is overkill for perf but exercises the full tp+dp compile path the
  larger ViT zoo can use.
"""
from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Megatron-style tensor-parallel rules for the transformer stack:
# column-parallel into the hidden dim, row-parallel back out.
# Covers BOTH kernel namings in this package:
#   * RL stack (nn/transformer.py): to_qkv / to_out / fc1 / fc2
#   * ViT zoo (nn/vit_layers.py):   attn.qkv / attn.proj, xattn|cross.{q,kv,proj},
#                                   Mlp.fc1/fc2, SwiGLUFFN.w12/w3
_TP_RULES: list[tuple[re.Pattern, P]] = [
    (re.compile(r"to_qkv.*kernel"), P(None, "mp")),
    (re.compile(r"to_out.*kernel"), P("mp", None)),
    (re.compile(r"(^|/)(attn|xattn|cross)/(qkv|q|kv)/kernel"), P(None, "mp")),
    (re.compile(r"(^|/)(attn|xattn|cross)/proj/kernel"), P("mp", None)),
    (re.compile(r"\bfc1\b.*kernel"), P(None, "mp")),
    (re.compile(r"\bfc2\b.*kernel"), P("mp", None)),
    (re.compile(r"(^|/)w12/kernel"), P(None, "mp")),
    (re.compile(r"(^|/)w3/kernel"), P("mp", None)),
]


def make_mesh(n_devices: int | None = None, mp: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % mp == 0, f"{n_devices} devices not divisible by mp={mp}"
    return Mesh(devices.reshape(n_devices // mp, mp), ("dp", "mp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "dp"
    return NamedSharding(mesh, P(*spec))


def _spec_for(path_str: str, ndim: int, mesh: Mesh) -> NamedSharding:
    if mesh.shape["mp"] > 1 and ndim == 2:
        for pat, spec in _TP_RULES:
            if pat.search(path_str):
                return NamedSharding(mesh, spec)
    return NamedSharding(mesh, P())


def shard_param_state(state, mesh: Mesh):
    """Place an nnx.State of parameters onto the mesh.

    2-D kernels matching the tensor-parallel rules shard over ``mp``;
    everything else replicates (dp gradient reduction is implicit)."""
    from flax import nnx

    flat = nnx.to_flat_state(state)
    placed = []
    for path, var in flat:
        path_str = "/".join(str(p) for p in path)
        val = var.get_value() if hasattr(var, "get_value") else var
        sh = _spec_for(path_str, getattr(val, "ndim", 0), mesh)
        new_val = jax.device_put(val, sh)
        if hasattr(var, "replace"):
            placed.append((path, var.replace(new_val)))
        else:
            placed.append((path, new_val))
    return nnx.from_flat_state(placed)


def shard_module_params(module, mesh: Mesh) -> None:
    """In-place GSPMD placement of an nnx module's parameters on the mesh
    (mp-rule kernels sharded, everything else replicated). The Trainer calls
    this before building the optimizer so optimizer moments inherit the same
    shardings — the tensor-parallel equivalent of the reference trainer's
    strategy plumbing (reference tactile_ssl/trainer/trainer.py:101-108)."""
    from flax import nnx

    state = nnx.state(module)
    nnx.update(module, shard_param_state(state, mesh))


def put_tree(tree, sharding: NamedSharding):
    """device_put every array leaf of a pytree with one sharding."""
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def put_batch(tree, mesh: Mesh):
    """Shard every leaf's leading (batch) axis over dp; pads are caller's job."""
    ds = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, ds), tree)
