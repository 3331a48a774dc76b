"""Fused-LN pallas kernel vs XLA LayerNorm at flagship shapes, fwd+bwd.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_layernorm.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

ROWS, D, INNER = 512 * 192, 256, 20


def timed(name, fn, *args):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    print(f"{name:40s} {(time.time() - t0) / INNER * 1e3:8.3f} ms")


def scan_grad(loss):
    @jax.jit
    def run(p, x):
        def step(c, _):
            g = jax.grad(loss)(c, x)
            return jax.tree.map(lambda a, b: a + 1e-9 * b, c, g), ()

        c, _ = jax.lax.scan(step, p, None, length=INNER)
        return c

    return run


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(ROWS, D)), jnp.bfloat16)
    params = (jnp.ones((D,), jnp.float32), jnp.zeros((D,), jnp.float32))

    def xla_ln(p, x):
        sc, bi = p
        xf = x.astype(jnp.float32)
        m = xf.mean(-1, keepdims=True)
        v = ((xf - m) ** 2).mean(-1, keepdims=True)
        y = ((xf - m) * jax.lax.rsqrt(v + 1e-5) * sc + bi).astype(x.dtype)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def pallas_ln(p, x):
        from m3l_tpu.nn.fused_layernorm import fused_layernorm

        sc, bi = p
        y = fused_layernorm(x, sc, bi)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    timed("XLA layernorm fwd+bwd", scan_grad(xla_ln), params, x)
    timed("pallas fused layernorm fwd+bwd", scan_grad(pallas_ln), params, x)


if __name__ == "__main__":
    main()
