"""Static-shape random masking for multimodal MAE.

The reference masks per-modality with ``torch.rand(...).argsort()`` and
splits each modality's permutation into masked/unmasked index blocks
(reference: models/pretrain_models.py:223-248). All counts are
config-determined, so on TPU the whole procedure compiles to fixed-shape
sorts and gathers — no dynamic shapes.

Index convention matches the reference: indices are *global* token positions
(each modality segment's permutation is offset by the segment start), masked
blocks of all segments are concatenated, then unmasked blocks of all segments
are concatenated.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class ModalMask(NamedTuple):
    """Mask realisation for one batch.

    masked_idx:   (B, M) global indices of masked tokens
    unmasked_idx: (B, K) global indices of kept tokens (encoder input order)
    restore_idx:  (B, N) gather indices st. concat([kept, masked], 1)[b, restore_idx[b]]
                  reproduces original token order (N = M + K)
    """

    masked_idx: jnp.ndarray
    unmasked_idx: jnp.ndarray
    restore_idx: jnp.ndarray


def random_modal_masking(
    key: jax.Array,
    batch: int,
    segment_sizes: Sequence[int],
    segment_masked: Sequence[int],
) -> ModalMask:
    """Sample a per-modality random mask.

    Each segment ``i`` of ``segment_sizes[i]`` tokens gets an independent
    uniform-argsort permutation; its first ``segment_masked[i]`` entries are
    masked. Mirrors reference models/pretrain_models.py:229-248 semantics.
    """
    masked_parts, unmasked_parts = [], []
    offset = 0
    keys = jax.random.split(key, max(len(segment_sizes), 1))
    for i, (n, m) in enumerate(zip(segment_sizes, segment_masked)):
        if n == 0:
            continue
        noise = jax.random.uniform(keys[i], (batch, n))
        perm = jnp.argsort(noise, axis=-1) + offset
        masked_parts.append(perm[:, :m])
        unmasked_parts.append(perm[:, m:])
        offset += n
    masked_idx = (
        jnp.concatenate(masked_parts, axis=1)
        if masked_parts
        else jnp.zeros((batch, 0), jnp.int32)
    )
    unmasked_idx = (
        jnp.concatenate(unmasked_parts, axis=1)
        if unmasked_parts
        else jnp.zeros((batch, 0), jnp.int32)
    )
    combined = jnp.concatenate([unmasked_idx, masked_idx], axis=1)
    restore_idx = jnp.argsort(combined, axis=-1)
    return ModalMask(masked_idx.astype(jnp.int32), unmasked_idx.astype(jnp.int32), restore_idx.astype(jnp.int32))


def gather_tokens(tokens: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, D)[b, idx[b]] -> (B, K, D); one fused take_along_axis."""
    return jnp.take_along_axis(tokens, idx[:, :, None], axis=1)


def restore_tokens(
    kept_tokens: jnp.ndarray,
    mask_token: jnp.ndarray,
    mask: ModalMask,
) -> jnp.ndarray:
    """Reassemble the full-length token sequence in original order.

    The reference scatters kept/mask tokens into a zeros buffer
    (models/pretrain_models.py:285-287); on TPU a single inverse-permutation
    gather is cheaper than two scatters and XLA fuses it with the decoder's
    first matmul.
    """
    b, m = mask.masked_idx.shape
    mask_block = jnp.broadcast_to(mask_token, (b, m, kept_tokens.shape[-1])).astype(kept_tokens.dtype)
    combined = jnp.concatenate([kept_tokens, mask_block], axis=1)
    return gather_tokens(combined, mask.restore_idx)
