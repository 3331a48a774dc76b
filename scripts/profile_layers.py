"""Layer-level microbench of the RL-stack transformer at flagship shapes.

Isolates LN / attention / MLP / Block / full-encoder fwd and fwd+bwd at
(B=512, N=192, D=256, heads=4) to find where the gap to the GEMM roofline
(~132 TF/s measured chained-GEMM rate) comes from. Scan-amortized, scalar-
readback-synced (relay semantics — CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_layers.py
"""
import time

import jax
import jax.numpy as jnp
from flax import nnx

B, N, D, H, INNER = 512, 192, 256, 4, 10


def bench(name, make_fn, params, x, gflop_fwd=None):
    def scan_body(p, x):
        def step(c, _):
            out = make_fn(p, c)
            return out.astype(c.dtype), ()
        y, _ = jax.lax.scan(step, x, None, length=INNER)
        return y.sum()

    f = jax.jit(scan_body)
    float(f(params, x))
    t0 = time.time()
    float(f(params, x))
    dt = (time.time() - t0) / INNER * 1e3
    note = ""
    if gflop_fwd:
        note = f"  ({gflop_fwd / dt:.0f} GFLOP/ms = {gflop_fwd / dt:.0f} TF/s)"
    print(f"{name:34s} {dt:7.2f} ms{note}")
    return dt


def bench_grad(name, make_loss, params, x, gflop=None):
    g = jax.grad(lambda p, c: make_loss(p, c))

    def scan_body(p, x):
        def step(c, _):
            return c, jax.tree.map(jnp.sum, g(p, x + 0 * c))
        _, outs = jax.lax.scan(step, jnp.zeros(()), None, length=INNER)
        return sum(jax.tree.leaves(jax.tree.map(jnp.sum, outs)))

    f = jax.jit(scan_body)
    float(f(params, x))
    t0 = time.time()
    float(f(params, x))
    dt = (time.time() - t0) / INNER * 1e3
    note = f"  ({gflop / dt:.0f} TF/s)" if gflop else ""
    print(f"{name:34s} {dt:7.2f} ms{note}")
    return dt


def main():
    from m3l_tpu.nn.transformer import Attention, FeedForward, Transformer

    rngs = nnx.Rngs(0)
    dt = jnp.bfloat16
    x = jax.device_put(jax.random.normal(jax.random.key(0), (B, N, D), dt))

    # raw GEMM reference at MLP shape
    w1 = jax.random.normal(jax.random.key(1), (D, 2 * D), dt)
    w2 = jax.random.normal(jax.random.key(2), (2 * D, D), dt)
    gemm_gflop = 2 * B * N * D * 2 * D * 2 / 1e9
    bench("raw 2-GEMM (MLP shape)", lambda p, c: (c @ p[0]) @ p[1], (w1, w2), x, gemm_gflop)

    ln = nnx.LayerNorm(D, epsilon=1e-5, dtype=dt, param_dtype=jnp.float32, rngs=rngs)
    gd, st = nnx.split(ln)
    bench("LayerNorm", lambda p, c: nnx.merge(gd, p)(c), st, x)

    attn = Attention(D, H, D // H, dtype=dt, rngs=rngs)
    gda, sta = nnx.split(attn)
    attn_gflop = (B * N * D * 3 * D + B * N * D * D + 2 * B * N * N * D) * 2 / 1e9
    bench("Attention fwd", lambda p, c: nnx.merge(gda, p)(c), sta, x, attn_gflop)
    bench_grad("Attention fwd+bwd", lambda p, c: nnx.merge(gda, p)(c).sum(), sta, x, 3 * attn_gflop / 1e0)

    ff = FeedForward(D, 2 * D, dtype=dt, rngs=rngs)
    gdf, stf = nnx.split(ff)
    bench("FeedForward fwd", lambda p, c: nnx.merge(gdf, p)(c), stf, x, gemm_gflop)
    bench_grad("FeedForward fwd+bwd", lambda p, c: nnx.merge(gdf, p)(c).sum(), stf, x, 3 * gemm_gflop)

    enc = Transformer(D, 4, H, D // H, 2 * D, dtype=dt, rngs=rngs)
    gde, ste = nnx.split(enc)
    layer_gflop = attn_gflop + gemm_gflop
    bench("4-layer encoder fwd", lambda p, c: nnx.merge(gde, p)(c), ste, x, 4 * layer_gflop)
    bench_grad("4-layer encoder fwd+bwd", lambda p, c: nnx.merge(gde, p)(c).sum(), ste, x, 12 * layer_gflop)


if __name__ == "__main__":
    main()
