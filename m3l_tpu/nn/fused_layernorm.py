"""Pallas fused LayerNorm (fwd + recompute bwd) for TPU.

Motivation: at the flagship shapes every transformer block runs two
LayerNorms over (B*N, D) = (98k, 256) activations; XLA lowers each as a
multi-kernel reduce + normalize with float32 intermediates — HBM-bandwidth
bound. This kernel keeps a row block in VMEM, computes mean/var and the
normalized output in ONE pass, and the backward recomputes the statistics in
VMEM (flash-style recompute) emitting dx plus per-block partial dscale/dbias
reduced outside (tiny).

Numerics match ``nnx.LayerNorm(dtype=..., param_dtype=f32)``: statistics in
float32, output cast to the input dtype. Gated off by default — adopt only
where measured faster than XLA's fusion (scripts/bench_layernorm.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 512


def _fwd_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)  # (R, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _bwd_kernel(x_ref, scale_ref, g_ref, dx_ref, dscale_ref, dbias_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    d = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    gs = g * scale_ref[:].astype(jnp.float32)
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    dx = (gs - m1 - xhat * m2) * rstd
    dx_ref[:] = dx.astype(dx_ref.dtype)
    # Partial-reduction outputs are (8, D) blocks (mosaic requires the
    # second-to-last block dim divisible by 8): the partial goes in row 0,
    # rows 1-7 are zeros, and the caller sums over all rows.
    row = jax.lax.broadcasted_iota(jnp.int32, (8, d), 0)
    dscale_ref[:] = jnp.where(row == 0, jnp.sum(g * xhat, axis=0)[None, :], 0.0)
    dbias_ref[:] = jnp.where(row == 0, jnp.sum(g, axis=0)[None, :], 0.0)


def _rows_block(rows: int) -> int:
    # callers guarantee rows % 8 == 0 (fused_layernorm falls back to the
    # XLA path otherwise): an r=1 grid of `rows` kernel instances plus
    # (rows, D) f32 partial dscale/dbias buffers is pathological (ADVICE r3)
    for r in (_BLOCK_ROWS, 256, 128, 64, 8):
        if rows % r == 0:
            return r
    raise ValueError(f"row count {rows} not divisible by 8; use the XLA path")


def _fwd_call(x2, scale, bias, eps, interpret):
    rows, d = x2.shape
    r = _rows_block(rows)
    xspec = pl.BlockSpec((r, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(rows // r,),
        in_specs=[xspec, pspec, pspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((rows, d), x2.dtype),
        interpret=interpret,
    )(x2, scale, bias)


def _bwd_call(x2, scale, g2, eps, interpret):
    rows, d = x2.shape
    r = _rows_block(rows)
    nblk = rows // r
    xspec = pl.BlockSpec((r, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    partial_spec = pl.BlockSpec((8, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dx, dsc, dbi = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(nblk,),
        in_specs=[xspec, pspec, xspec],
        out_specs=[xspec, partial_spec, partial_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), x2.dtype),
            jax.ShapeDtypeStruct((nblk * 8, d), jnp.float32),
            jax.ShapeDtypeStruct((nblk * 8, d), jnp.float32),
        ],
        interpret=interpret,
    )(x2, scale, g2)
    return dx, dsc.sum(0), dbi.sum(0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_ln(x2, scale, bias, eps, interpret):
    return _fwd_call(x2, scale, bias, eps, interpret)


def _fused_ln_fwd(x2, scale, bias, eps, interpret):
    return _fwd_call(x2, scale, bias, eps, interpret), (x2, scale)


def _fused_ln_bwd(eps, interpret, res, g):
    x2, scale = res
    dx, dscale, dbias = _bwd_call(x2, scale, g, eps, interpret)
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def fused_layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, *, eps: float = 1e-5, interpret: bool | None = None) -> jnp.ndarray:
    """LayerNorm over the last axis; any leading shape."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    if x2.shape[0] % 8 != 0:  # odd row counts: let XLA handle it (ADVICE r3)
        xf = x2.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + float(eps))
        out = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return out.astype(x.dtype).reshape(shape)
    return _fused_ln(x2, scale, bias, float(eps), interpret).reshape(shape)


def use_fused_ln() -> bool:
    """Opt-in gate (flip after measuring vs XLA's fusion on the target)."""
    import os

    return os.environ.get("M3L_FUSED_LN", "0") == "1" and jax.default_backend() == "tpu"
