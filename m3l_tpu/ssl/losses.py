"""Self-distillation losses (DINO, iBOT, KoLeo) as pure functions.

The reference implements these as stateful nn.Modules with torch.distributed
collectives — synchronous all_reduce inside Sinkhorn normalization and an
*async* all_reduce for the teacher-center update, overlapped with compute
(reference tactile_ssl/loss/dino_loss.py:34-102, ibot_patch_loss.py:62-166,
koleo_loss.py:18-48).

TPU-native form: the center is explicit state threaded through the jitted
step; cross-replica reductions are ``jax.lax.pmean/psum`` over the ``dp``
mesh axis when ``axis_name`` is given (XLA schedules them asynchronously,
subsuming the reference's async-handle trick — SURVEY.md §5 distributed
notes). Single-device runs pass ``axis_name=None`` and the psums degrade to
identity, mirroring the reference's ``dist.is_initialized()`` guards.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp


class DINOLossState(NamedTuple):
    center: jnp.ndarray  # (1, K) for CLS, (1, 1, K) for patch centers


def init_dino_state(out_dim: int, patch: bool = False) -> DINOLossState:
    shape = (1, 1, out_dim) if patch else (1, out_dim)
    return DINOLossState(jnp.zeros(shape, jnp.float32))


def _pmean(x, axis_name):
    return jax.lax.pmean(x, axis_name) if axis_name else x


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name else x


def softmax_center_teacher(state: DINOLossState, teacher_output: jnp.ndarray, teacher_temp) -> jnp.ndarray:
    """Centered + sharpened teacher distribution (dino_loss.py:27-31)."""
    t = teacher_output.astype(jnp.float32)
    return jax.nn.softmax((t - state.center.reshape((1,) * (t.ndim - 1) + (-1,))) / teacher_temp, axis=-1)


def update_center(state: DINOLossState, teacher_output: jnp.ndarray, momentum: float = 0.9, axis_name: Optional[str] = None) -> DINOLossState:
    """EMA center update with cross-replica mean (dino_loss.py:77-102).

    For patch tokens (B, N, K) the batch center is mean over tokens then sum
    over batch (ibot_patch_loss.py:147-151)."""
    t = teacher_output.astype(jnp.float32)
    if t.ndim == 3:
        batch_sum = jnp.sum(jnp.mean(t, axis=1), axis=0, keepdims=True)
        n = t.shape[0]
    else:
        batch_sum = jnp.sum(t, axis=0, keepdims=True)
        n = t.shape[0]
    batch_sum = _psum(batch_sum, axis_name)
    n_total = _psum(jnp.asarray(n, jnp.float32), axis_name)
    batch_center = (batch_sum / n_total).reshape(state.center.shape)
    return DINOLossState(state.center * momentum + batch_center * (1.0 - momentum))


def sinkhorn_knopp_teacher(
    teacher_output: jnp.ndarray,
    teacher_temp,
    n_iterations: int = 3,
    axis_name: Optional[str] = None,
    n_samples: Optional[jnp.ndarray] = None,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sinkhorn-Knopp assignment (dino_loss.py:34-62 / ibot:63-98).

    ``n_samples`` overrides the local sample count (iBOT passes the number of
    masked patches); it is psum-reduced across replicas. ``sample_mask``
    (B,) bool excludes rows from the transport problem entirely — the
    reference runs Sinkhorn only over the *gathered* kept patch tokens
    (ibot_patch_loss.py:63-98), so at static shapes the non-kept rows must be
    zeroed before normalization, not merely discounted via ``n_samples``."""
    t = teacher_output.astype(jnp.float32)
    q = jnp.exp(t / teacher_temp).T  # (K, B)
    if sample_mask is not None:
        q = q * sample_mask.astype(jnp.float32)[None, :]
    local_b = jnp.asarray(q.shape[1], jnp.float32) if n_samples is None else jnp.asarray(n_samples, jnp.float32)
    b_total = _psum(local_b, axis_name)
    k = q.shape[0]
    q = q / _psum(jnp.sum(q), axis_name)
    for _ in range(n_iterations):
        rows = _psum(jnp.sum(q, axis=1, keepdims=True), axis_name)
        q = q / rows / k
        # clip guards the all-zero columns of masked-out samples (0/eps = 0)
        q = q / jnp.clip(jnp.sum(q, axis=0, keepdims=True), 1e-30, None) / b_total
    return (q * b_total).T


def dino_cross_entropy(
    student_outputs: Sequence[jnp.ndarray],
    teacher_probs: Sequence[jnp.ndarray],
    student_temp: float = 0.1,
) -> jnp.ndarray:
    """Sum over (student view, teacher view) pairs of
    -mean(sum(t * log_softmax(s / temp))) (dino_loss.py:64-75)."""
    total = jnp.zeros((), jnp.float32)
    for s in student_outputs:
        lsm = jax.nn.log_softmax(s.astype(jnp.float32) / student_temp, axis=-1)
        for t in teacher_probs:
            total = total - jnp.mean(jnp.sum(t * lsm, axis=-1))
    return total


def ibot_patch_loss(
    student_patch_logits: jnp.ndarray,  # (B, N, K)
    teacher_patch_probs: jnp.ndarray,  # (B, N, K)
    student_masks: jnp.ndarray,  # (B, N) bool: True at masked (predicted) patches
    student_temp: float = 0.1,
) -> jnp.ndarray:
    """Masked patch-level distillation (ibot_patch_loss.py:117-139
    forward_masked with the default per-sample 1/num_masked weighting)."""
    lsm = jax.nn.log_softmax(student_patch_logits.astype(jnp.float32) / student_temp, axis=-1)
    per_patch = jnp.sum(teacher_patch_probs * lsm, axis=-1)  # (B, N)
    weight = 1.0 / jnp.clip(student_masks.sum(-1, keepdims=True), 1.0, None)
    masked = per_patch * student_masks.astype(jnp.float32) * weight
    return -jnp.sum(masked) / student_masks.shape[0]


def ibot_patch_loss_all_pairs(
    student_patch_logits: jnp.ndarray,  # (M, B, N, K)
    teacher_patch_probs: jnp.ndarray,  # (M, B, N, K)
    keep_masks: jnp.ndarray,  # (M, B, N) bool: True at tokens kept by each view
    student_temp: float = 0.1,
) -> jnp.ndarray:
    """All-pairs patch distillation as the reference's DINOv2 path uses it:
    ``iBOTPatchLoss.forward`` (ibot_patch_loss.py:100-113) double-loops over
    every (student view, teacher view) pair and takes a PLAIN mean per pair
    over the gathered kept tokens — M² terms, no per-sample weighting.

    Static-shape port: all N positions are computed (key-masked forward), so
    each pair term is a masked mean weighted by the teacher view's keep mask
    (exactly the gathered-token mean for same-view pairs; for cross-view
    pairs the reference aligns tokens by gather order across *different*
    masks — spatially arbitrary — whereas this aligns spatially; scale and
    term count match, see docs/PARITY.md)."""
    m = student_patch_logits.shape[0]
    lsm = jax.nn.log_softmax(student_patch_logits.astype(jnp.float32) / student_temp, axis=-1)
    t = teacher_patch_probs.astype(jnp.float32)
    total = jnp.zeros((), jnp.float32)
    for i in range(m):
        for j in range(m):
            per_tok = jnp.sum(t[j] * lsm[i], axis=-1)  # (B, N)
            w = keep_masks[j].astype(jnp.float32)
            total = total - jnp.sum(per_tok * w) / jnp.clip(w.sum(), 1.0, None)
    return total


def koleo_loss(student_output: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Kozachenko-Leonenko entropic regularizer (koleo_loss.py:18-48):
    -mean(log distance-to-nearest-neighbor) over L2-normalized features."""
    x = student_output.astype(jnp.float32)
    # sqrt(sum + eps^2), not clip(norm, eps): clip clamps the forward but the
    # norm's VJP is still 0/0 = NaN at an exactly-zero vector (CLAUDE.md rule)
    x = x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps * eps)
    dots = x @ x.T
    n = x.shape[0]
    dots = dots - 2.0 * jnp.eye(n)  # exclude self (fill diag with -1-ish)
    nn_idx = jnp.argmax(dots, axis=1)
    # eps INSIDE the norm (like torch F.pairwise_distance(eps=1e-8), which the
    # reference's KoLeo uses): d/dx ||x-y|| is 0/0 = NaN at x == y, and two
    # near-identical frames in a batch (common early in training, worse under
    # bf16 rounding) would otherwise poison every gradient in the step.
    d = x - x[nn_idx]
    dists = jnp.sqrt(jnp.sum(d * d, axis=-1) + eps * eps)
    return -jnp.mean(jnp.log(dists))
