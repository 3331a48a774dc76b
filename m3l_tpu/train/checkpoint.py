"""Checkpoint save/load (orbax) for nnx modules + optax states.

Capability parity with the reference's two checkpoint systems
(SURVEY.md §5): the Fabric trainer's ``last.ckpt`` every epoch + periodic
``epoch-%04d.ckpt`` with resume-from-last (reference
tactile_ssl/trainer/trainer.py:560-637), and the RL side's model+normalizer
state bundles. States are stored as pure array pytrees so checkpoints are
readable without reconstructing python classes first.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import nnx


def _pure(tree: Any) -> Any:
    def conv(x):
        if isinstance(x, (np.ndarray, jax.Array)):
            return np.asarray(x)
        return x

    if isinstance(tree, nnx.statelib.State):
        tree = nnx.to_pure_dict(tree)
    return jax.tree.map(conv, tree)


def save_checkpoint(path: str, payload: dict) -> None:
    """payload: {name: nnx.State | pytree | scalar}."""
    path = os.path.abspath(path)
    pure = {k: _pure(v) for k, v in payload.items()}
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, pure, force=True)


def load_checkpoint(path: str) -> dict:
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def _norm_path(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    # nnx.State leaves are VariableState pytrees whose array sits under a
    # final ``.value`` attr; the saved pure dict (nnx.to_pure_dict) drops it
    if parts and parts[-1] == "value":
        parts = parts[:-1]
    return "/".join(parts)


def restore_like(template: Any, pure: Any) -> Any:
    """Path-keyed restore: rebuild ``template``'s structure from ``pure``'s
    arrays matched by tree path (dict keys / sequence indices normalized to
    strings). Leaf-ORDER differences between the saved and live trees — e.g.
    orbax restoring int-keyed dicts with lexicographic "10" < "2" string
    keys — can therefore never silently transpose weights (reference
    models/sac_mae.py:402-412 saves params by name)."""
    import jax.numpy as jnp

    t_flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    p_map = {_norm_path(p): v for p, v in jax.tree_util.tree_flatten_with_path(pure)[0]}
    leaves = []
    for path, old in t_flat:
        key = _norm_path(path)
        if key not in p_map:
            raise KeyError(f"checkpoint missing leaf {key!r}; has {sorted(p_map)[:5]}...")
        new = jnp.asarray(p_map.pop(key))
        if hasattr(old, "shape") and tuple(old.shape) != tuple(new.shape):
            raise ValueError(f"shape mismatch at {key!r}: model {tuple(old.shape)} vs checkpoint {tuple(new.shape)}")
        leaves.append(new)
    if p_map:
        raise KeyError(f"checkpoint has {len(p_map)} unmatched leaves, e.g. {sorted(p_map)[:3]}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def restore_module_state(module: nnx.Module, pure_state: dict) -> None:
    state = nnx.state(module)
    nnx.replace_by_pure_dict(state, pure_state)
    nnx.update(module, state)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    last = os.path.join(ckpt_dir, "last.ckpt")
    return last if os.path.isdir(last) else None
