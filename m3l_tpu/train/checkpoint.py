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


def restore_module_state(module: nnx.Module, pure_state: dict) -> None:
    state = nnx.state(module)
    nnx.replace_by_pure_dict(state, pure_state)
    nnx.update(module, state)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    last = os.path.join(ckpt_dir, "last.ckpt")
    return last if os.path.isdir(last) else None
