"""Per-layer attention benchmark on the real chip: einsum vs flash v1 (head-
split transposes in XLA) vs flash v2 (qkv-fused, VMEM head split).

Times one full Attention layer (qkv proj + attention + out proj) fwd+bwd at
the M3L flagship shape (B=512, N=192, D=256, H=4), scan-amortized and synced
by device->host scalar readback (CLAUDE.md relay gotcha).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_attention.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B, N, D, H = 512, 192, 256, 4
DH = D // H
INNER = 10


def timed(name, fn, *args):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    out = fn(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.time() - t0) / INNER * 1e3
    print(f"{name:50s} {dt:8.3f} ms")
    return dt


def scan_grad(loss_fn):
    @jax.jit
    def run(params, x):
        def step(p, _):
            g = jax.grad(loss_fn)(p, x)
            return jax.tree.map(lambda a, b: a + 1e-9 * b, p, g), ()

        p, _ = jax.lax.scan(step, params, None, length=INNER)
        return p

    return run


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.02, jnp.float32)
    wout = jnp.asarray(rng.normal(size=(D, D)) * 0.02, jnp.float32)
    params = (wqkv, wout)
    scale = DH**-0.5

    def attn_einsum(p, x):
        wq, wo = p
        qkv = (x @ wq.astype(x.dtype)).reshape(B, N, 3, H, DH)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        s = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * scale
        a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, D)
        return jnp.sum((o @ wo.astype(o.dtype)).astype(jnp.float32) ** 2)

    def attn_v1(p, x):
        from m3l_tpu.nn.flash_attention import flash_attention

        wq, wo = p
        qkv = (x @ wq.astype(x.dtype)).reshape(B, N, 3, H, DH)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        o = flash_attention(q, k, v, scale=scale).reshape(B, N, D)
        return jnp.sum((o @ wo.astype(o.dtype)).astype(jnp.float32) ** 2)

    def attn_v2(p, x):
        from m3l_tpu.nn.flash_attention import flash_attention_qkv

        wq, wo = p
        qkv = x @ wq.astype(x.dtype)
        o = flash_attention_qkv(qkv, H, scale=scale)
        return jnp.sum((o @ wo.astype(o.dtype)).astype(jnp.float32) ** 2)

    import sys

    variants = {"v2": attn_v2, "v1": attn_v1, "einsum": attn_einsum}
    pick = [a for a in sys.argv[1:] if a in variants] or ["v2", "v1", "einsum"]
    for name in pick:
        timed(f"{name} layer fwd+bwd", scan_grad(variants[name]), params, x)


if __name__ == "__main__":
    main()
