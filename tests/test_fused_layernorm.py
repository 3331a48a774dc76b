"""Pallas fused LayerNorm vs the reference math (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3l_tpu.nn.fused_layernorm import fused_layernorm


def ref_ln(x, sc, bi, eps=1e-5):
    x = x.astype(jnp.float32)
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * sc + bi


@pytest.mark.parametrize("rows,d", [(24, 32), (17, 128), (8, 256)])
def test_fused_ln_fwd(rows, d):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(rows, d)), jnp.float32)
    sc = jnp.asarray(rng.normal(size=d), jnp.float32)
    bi = jnp.asarray(rng.normal(size=d), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fused_layernorm(x, sc, bi, interpret=True)), np.asarray(ref_ln(x, sc, bi)), atol=2e-6
    )


def test_fused_ln_grads_and_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 12, 64)), jnp.float32)
    sc = jnp.asarray(rng.normal(size=64), jnp.float32)
    bi = jnp.asarray(rng.normal(size=64), jnp.float32)
    g1 = jax.grad(lambda *a: jnp.sum(jnp.sin(fused_layernorm(*a, interpret=True))), argnums=(0, 1, 2))(x, sc, bi)
    g2 = jax.grad(lambda *a: jnp.sum(jnp.sin(ref_ln(*a))), argnums=(0, 1, 2))(x, sc, bi)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    # bf16 input path: output dtype preserved, values close to f32 reference
    xb = x.astype(jnp.bfloat16)
    ob = fused_layernorm(xb, sc, bi, interpret=True)
    assert ob.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(ob, np.float32), np.asarray(ref_ln(x, sc, bi)), atol=0.05)


def test_fused_ln_grads_odd_rows_fallback():
    # rows % 8 != 0 routes through the XLA fallback (ADVICE r3: no r=1 grid);
    # gradients must still match the reference LN
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(13, 64)), jnp.float32)
    sc = jnp.asarray(rng.normal(size=64), jnp.float32)
    bi = jnp.asarray(rng.normal(size=64), jnp.float32)
    g1 = jax.grad(lambda *a: jnp.sum(jnp.sin(fused_layernorm(*a, interpret=True))), argnums=(0, 1, 2))(x, sc, bi)
    g2 = jax.grad(lambda *a: jnp.sum(jnp.sin(ref_ln(*a))), argnums=(0, 1, 2))(x, sc, bi)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
