"""Exponential-moving-average teacher update.

Reference: tactile_ssl/utils/ema.py:12-17 ``update_moving_average``
(teacher = decay * teacher + (1 - decay) * student), applied after each train
batch (dino.py:154-173). Pure pytree op, safe inside jit with a traced decay
(the momentum schedule becomes a scalar input, not a Python generator).
"""
from __future__ import annotations

import jax


def ema_update(teacher_state, student_state, decay):
    return jax.tree.map(lambda t, s: t * decay + s.astype(t.dtype) * (1.0 - decay), teacher_state, student_state)
