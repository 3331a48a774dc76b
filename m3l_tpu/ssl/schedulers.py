"""Training schedules as pure step->value functions (optax-compatible).

Contracts match the reference schedulers:
* :func:`warmup_cosine_schedule` — linear warmup from ``start_lr`` to
  ``base_lr`` over ``warmup_steps``, then cosine to ``final_lr`` over
  ``T_max - warmup_steps`` (reference tactile_ssl/model/custom_scheduler.py:11-48).
* :func:`cosine_wd_schedule` — cosine weight decay from ``ref_wd`` to
  ``final_wd`` over ``T_max`` steps, honoring WD-excluded groups via an optax
  mask at the optimizer level (reference custom_scheduler.py:51-74).
* :func:`linear_schedule` — the momentum (EMA decay) ramp
  (reference dino.py:481-488).
* :func:`teacher_temp_schedule` — linear warmup then constant
  (reference dino.py:518-529).
"""
from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_schedule(base_lr: float, start_lr: float, final_lr: float, warmup_steps: int, total_steps: int):
    t_max = max(total_steps - warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = start_lr + (step / max(warmup_steps, 1)) * (base_lr - start_lr)
        progress = (step - warmup_steps) / t_max
        cos = final_lr + (base_lr - final_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        cos = jnp.maximum(final_lr, cos)
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def cosine_wd_schedule(ref_wd: float, final_wd: float, total_steps: int):
    def schedule(step):
        progress = jnp.asarray(step, jnp.float32) / max(total_steps, 1)
        wd = final_wd + (ref_wd - final_wd) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        if final_wd <= ref_wd:
            return jnp.maximum(final_wd, wd)
        return jnp.minimum(final_wd, wd)

    return schedule


def linear_schedule(start: float, end: float, total_steps: int):
    def schedule(step):
        frac = jnp.clip(jnp.asarray(step, jnp.float32) / max(total_steps, 1), 0.0, 1.0)
        return start + frac * (end - start)

    return schedule


def teacher_temp_schedule(temp: float | tuple[float, float], warmup_steps: int):
    if isinstance(temp, (int, float)):
        t = float(temp)
        return lambda step: jnp.asarray(t, jnp.float32)
    t0, t1 = temp

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = t0 + step * (t1 - t0) / max(warmup_steps, 1)
        return jnp.where(step > warmup_steps, t1, warm)

    return schedule
