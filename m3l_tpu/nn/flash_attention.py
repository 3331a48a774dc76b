"""Fused attention pallas kernel for TPU (flash-attention style).

Why: at M3L shapes (seq 192, head_dim 64, heads 4, batch 512) the einsum
attention materializes a (B, H, N, N) float32 score tensor in HBM —
~300 MB per layer per direction — and the softmax becomes HBM-bandwidth
bound (measured ~4.5 ms fwd+bwd per layer vs ~0.5 ms of MXU work). The
sequence is short enough that each (batch, head)'s whole score matrix fits
VMEM, so this kernel fuses QK^T -> softmax -> AV per (batch*head) block and
never writes scores to HBM. The backward kernel recomputes the softmax in
VMEM (flash-attention recomputation) and emits dq/dk/dv directly.

Replaces the reference's xformers `memory_efficient_attention` CUDA kernels
(reference tactile_ssl/model/layers/attention.py:28,92) with a TPU-native
equivalent. Numerics: scores and softmax in float32 (same as the einsum
path), inputs/outputs bf16 or f32.

Falls back to the einsum path automatically off-TPU (pallas interpret mode
is for tests only).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows of (batch*head) processed per kernel instance; VMEM per instance at
# N=192, Dh=64: 3 inputs + 1 output (G*N*Dh bf16) + scores (G*N*N f32).
# Fwd G=16 measured fastest on v5e (2.80 ms vs 2.94 at G=8 for the
# 512x4-head fwd+bwd layer); the backward holds ~2x the live tensors and
# exceeds the 16 MB scoped-VMEM limit at G=16 inside large graphs, so it
# uses G=8.
_BLOCK_BH_FWD = 16
_BLOCK_BH_BWD = 8


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[:]  # (G, N, Dh)
    k = k_ref[:]
    v = v_ref[:]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    s = s * scale
    if bias_ref is not None:
        s = s + bias_ref[:][:, None, :]  # (G, 1, N) key bias
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    a = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(a.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, dq_ref, dk_ref, dv_ref, *, scale: float):
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    g = g_ref[:]
    # recompute the softmax in VMEM (never materialized in HBM)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    s = s * scale
    if bias_ref is not None:
        s = s + bias_ref[:][:, None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    a = e / jnp.sum(e, axis=-1, keepdims=True)  # (G, N, N) f32

    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # dv[g,m,d] = sum_n a[g,n,m] * g[g,n,d]
    dv = jax.lax.dot_general(a, gf, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    # da[g,n,m] = sum_d g[g,n,d] * v[g,m,d]
    da = jax.lax.dot_general(gf, vf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))  # softmax bwd
    ds = ds * scale
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    dq = jax.lax.dot_general(ds, kf, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, qf, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _block(bh: int, limit: int) -> int:
    for g in (limit, 8, 4, 2, 1):
        if g <= limit and bh % g == 0:
            return g
    return 1


def _specs(g: int, n: int, dh: int, with_bias: bool):
    data = pl.BlockSpec((g, n, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((g, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return data, bias


def _fwd_call(q, k, v, bias, scale, interpret):
    bh, n, dh = q.shape
    # f32 inputs double the VMEM footprint; halve the block
    limit = _BLOCK_BH_FWD if q.dtype == jnp.bfloat16 else _BLOCK_BH_FWD // 2
    g = _block(bh, limit)
    data, bspec = _specs(g, n, dh, bias is not None)
    kern = functools.partial(_fwd_kernel, scale=scale) if bias is not None else (
        lambda q_ref, k_ref, v_ref, o_ref: _fwd_kernel(q_ref, k_ref, v_ref, None, o_ref, scale=scale)
    )
    in_specs = [data, data, data] + ([bspec] if bias is not None else [])
    args = (q, k, v) + ((bias,) if bias is not None else ())
    return pl.pallas_call(
        kern,
        grid=(bh // g,),
        in_specs=in_specs,
        out_specs=data,
        out_shape=jax.ShapeDtypeStruct((bh, n, dh), q.dtype),
        interpret=interpret,
    )(*args)


def _bwd_call(q, k, v, bias, g_out, scale, interpret):
    bh, n, dh = q.shape
    limit = _BLOCK_BH_BWD if q.dtype == jnp.bfloat16 else _BLOCK_BH_BWD // 2
    g = _block(bh, limit)
    data, bspec = _specs(g, n, dh, bias is not None)
    if bias is not None:
        kern = functools.partial(_bwd_kernel, scale=scale)
        in_specs = [data, data, data, bspec, data]
        args = (q, k, v, bias, g_out)
    else:
        kern = lambda q_ref, k_ref, v_ref, g_ref, dq, dk, dv: _bwd_kernel(q_ref, k_ref, v_ref, None, g_ref, dq, dk, dv, scale=scale)
        in_specs = [data, data, data, data]
        args = (q, k, v, g_out)
    shapes = [jax.ShapeDtypeStruct((bh, n, dh), q.dtype)] * 3
    return pl.pallas_call(
        kern,
        grid=(bh // g,),
        in_specs=in_specs,
        out_specs=[data, data, data],
        out_shape=shapes,
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, bias, scale, interpret):
    return _fwd_call(q, k, v, bias, scale, interpret)


def _flash_fwd(q, k, v, bias, scale, interpret):
    return _fwd_call(q, k, v, bias, scale, interpret), (q, k, v, bias)


def _flash_bwd(scale, interpret, res, g_out):
    q, k, v, bias = res
    dq, dk, dv = _bwd_call(q, k, v, bias, g_out, scale, interpret)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,  # (B, N, H, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    key_mask: Optional[jnp.ndarray] = None,  # (B, N) bool, True = attend
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused multi-head attention, (B, N, H, Dh) -> (B, N, H, Dh)."""
    b, n, h, dh = q.shape
    if scale is None:
        scale = dh**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def collapse(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, dh)

    bias = None
    if key_mask is not None:
        bias = jnp.where(key_mask, 0.0, -1e30).astype(jnp.float32)  # (B, N)
        bias = jnp.repeat(bias, h, axis=0)  # (B*H, N)
    out = _flash(collapse(q), collapse(k), collapse(v), bias, float(scale), interpret)
    return out.reshape(b, h, n, dh).transpose(0, 2, 1, 3)


def use_flash() -> bool:
    """Flash path only on real TPU backends (interpret mode is test-only)."""
    return jax.default_backend() == "tpu"


# --------------------------------------------------------------------- #
# v2: qkv-fused kernel. Takes the packed (B, N, 3*H*Dh) output of the qkv
# projection directly and returns (B, N, H*Dh) ready for the output
# projection. The v1 interface above needs XLA to materialize 3 head-split
# transposes of q/k/v plus the inverse transpose of the output — ~6 HBM
# relayout passes (~400 MB/layer at M3L shapes, measured ~1.5 ms of the
# 2.8 ms/layer). Here the head split/merge happens on VMEM-resident blocks
# inside the kernel (vector shuffles, no HBM traffic), and the backward
# emits the packed dqkv so the qkv-projection backward fuses cleanly too.
# --------------------------------------------------------------------- #
import os

_BLOCK_B_FWD = int(os.environ.get("M3L_FLASH_GB_FWD", "8"))
_BLOCK_B_BWD = int(os.environ.get("M3L_FLASH_GB_BWD", "4"))

# The kernel's live f32 (H*G, N, N) score-sized temporaries dominate the
# scoped-VMEM stack (measured: the SSL MAE decoder at heads=16, N=196, G=8
# needs 39.3 MB vs mosaic's 16 MB default — s + softmax temps ≈ 1.5× the
# score buffer fwd, ≈ 3× bwd with da/ds live). We raise the per-kernel limit
# (v5e has 128 MB VMEM) and shrink G until the estimate fits the budget, so
# head-heavy shapes compile while MXU-bound RL shapes keep their measured-
# fastest blocks.
_VMEM_LIMIT = 96 * 1024 * 1024
_VMEM_BUDGET = 48 * 1024 * 1024


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


def _fit_block(b: int, n: int, heads: int, limit: int, score_copies: float) -> int:
    g = _block(b, max(limit, 1))
    while g > 1:
        scores = heads * g * _rup(n, 8) * _rup(n, 128) * 4
        if score_copies * scores <= _VMEM_BUDGET:
            break
        g = _block(b, g - 1)  # next smaller divisor of b
    return g


def _split_heads(blk: jnp.ndarray, heads: int, part: int):
    """(G, N, 3*H*Dh) -> (H*G, N, Dh) for part in {0:q, 1:k, 2:v}.

    Head h of batch row g lands at leading index h*G + g. Implemented as
    per-head lane slices + leading-axis concat: Mosaic rejects reshapes that
    split the lane (minor) dimension (`vector<...x256xbf16> ->
    vector<...x4x64xbf16>` fails infer-vector-layout), but offset lane
    slices and concats lower fine."""
    g, n, thd = blk.shape
    hd = thd // 3
    dh = hd // heads
    base = part * hd
    hs = [blk[:, :, base + h * dh : base + (h + 1) * dh] for h in range(heads)]
    return jnp.concatenate(hs, axis=0) if heads > 1 else hs[0]


def _merge_heads(x: jnp.ndarray, g: int, heads: int):
    """(H*G, N, Dh) -> (G, N, H*Dh) (inverse of :func:`_split_heads`)."""
    if heads == 1:
        return x
    return jnp.concatenate([x[h * g : (h + 1) * g] for h in range(heads)], axis=-1)


def _softmax_rows(s: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_qkv_kernel(qkv_ref, bias_ref, o_ref, *, scale: float, heads: int):
    blk = qkv_ref[:]  # (G, N, 3*H*Dh)
    g = blk.shape[0]
    q = _split_heads(blk, heads, 0)
    k = _split_heads(blk, heads, 1)
    v = _split_heads(blk, heads, 2)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    s = s * scale  # (H*G, N, N)
    if bias_ref is not None:
        b = bias_ref[:][:, 0]  # (G, 1, N) -> (G, N)
        s = s.reshape(heads, g, *s.shape[1:]) + b[None, :, None, :]
        s = s.reshape(heads * g, *s.shape[2:])
    a = _softmax_rows(s)
    o = jax.lax.dot_general(a.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    o_ref[:] = _merge_heads(o.astype(o_ref.dtype), g, heads)


def _bwd_qkv_kernel(qkv_ref, bias_ref, g_ref, dqkv_ref, *, scale: float, heads: int):
    blk = qkv_ref[:]
    g = blk.shape[0]
    q = _split_heads(blk, heads, 0)
    k = _split_heads(blk, heads, 1)
    v = _split_heads(blk, heads, 2)
    go = g_ref[:]  # (G, N, H*Dh)
    dh = go.shape[-1] // heads
    parts = [go[:, :, h * dh : (h + 1) * dh] for h in range(heads)]
    gout = jnp.concatenate(parts, axis=0) if heads > 1 else parts[0]  # (H*G, N, Dh)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    s = s * scale
    if bias_ref is not None:
        b = bias_ref[:][:, 0]
        s = s.reshape(heads, g, *s.shape[1:]) + b[None, :, None, :]
        s = s.reshape(heads * g, *s.shape[2:])
    a = _softmax_rows(s)  # (H*G, N, N) f32

    gf = gout.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jax.lax.dot_general(a, gf, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    da = jax.lax.dot_general(gf, vf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
    ds = ds * scale
    dq = jax.lax.dot_general(ds, k.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q.astype(jnp.float32), (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    dt = dqkv_ref.dtype
    dqkv_ref[:] = jnp.concatenate(
        [_merge_heads(dq.astype(dt), g, heads), _merge_heads(dk.astype(dt), g, heads), _merge_heads(dv.astype(dt), g, heads)],
        axis=-1,
    )


def _qkv_call(qkv, bias, scale, heads, interpret, *, fwd: bool, g_out=None):
    b, n, thd = qkv.shape
    hd = thd // 3
    limit = (_BLOCK_B_FWD if fwd else _BLOCK_B_BWD) if qkv.dtype == jnp.bfloat16 else (_BLOCK_B_FWD if fwd else _BLOCK_B_BWD) // 2
    g = _fit_block(b, n, heads, limit, 2.0 if fwd else 3.0)
    qspec = pl.BlockSpec((g, n, thd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((g, n, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((g, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if bias is not None:
        bias = bias[:, None, :]  # (B, 1, N): trailing block dims == array dims
    params = None if interpret else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    if fwd:
        if bias is not None:
            kern = functools.partial(_fwd_qkv_kernel, scale=scale, heads=heads)
            in_specs, args = [qspec, bspec], (qkv, bias)
        else:
            kern = lambda q_ref, o_ref: _fwd_qkv_kernel(q_ref, None, o_ref, scale=scale, heads=heads)
            in_specs, args = [qspec], (qkv,)
        return pl.pallas_call(
            kern, grid=(b // g,), in_specs=in_specs, out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((b, n, hd), qkv.dtype), interpret=interpret,
            compiler_params=params,
        )(*args)
    if bias is not None:
        kern = functools.partial(_bwd_qkv_kernel, scale=scale, heads=heads)
        in_specs, args = [qspec, bspec, ospec], (qkv, bias, g_out)
    else:
        kern = lambda q_ref, g_ref, d_ref: _bwd_qkv_kernel(q_ref, None, g_ref, d_ref, scale=scale, heads=heads)
        in_specs, args = [qspec, ospec], (qkv, g_out)
    return pl.pallas_call(
        kern, grid=(b // g,), in_specs=in_specs, out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, n, thd), qkv.dtype), interpret=interpret,
        compiler_params=params,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _flash_qkv(qkv, bias, scale, heads, interpret):
    return _qkv_call(qkv, bias, scale, heads, interpret, fwd=True)


def _flash_qkv_fwd(qkv, bias, scale, heads, interpret):
    return _qkv_call(qkv, bias, scale, heads, interpret, fwd=True), (qkv, bias)


def _flash_qkv_bwd(scale, heads, interpret, res, g_out):
    qkv, bias = res
    dqkv = _qkv_call(qkv, bias, scale, heads, interpret, fwd=False, g_out=g_out)
    return dqkv, None


_flash_qkv.defvjp(_flash_qkv_fwd, _flash_qkv_bwd)


def flash_attention_qkv(
    qkv: jnp.ndarray,  # (B, N, 3*H*Dh) packed projection output
    num_heads: int,
    *,
    key_mask: Optional[jnp.ndarray] = None,  # (B, N) bool, True = attend
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused attention on the packed qkv tensor -> (B, N, H*Dh)."""
    b, n, thd = qkv.shape
    dh = thd // (3 * num_heads)
    if scale is None:
        scale = dh**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bias = None
    if key_mask is not None:
        bias = jnp.where(key_mask, 0.0, -1e30).astype(jnp.float32)  # (B, N)
    return _flash_qkv(qkv, bias, float(scale), num_heads, interpret)
