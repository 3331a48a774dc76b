"""SSL pretrain throughput: MAE ms/step on the reference workload shape.

Reference SSL workload (reference config/experiment/mae_vit.yaml:20-36 +
config/data/digit.yaml:118-131): 224x224, in_chans 6 (2 stacked frames),
batch 64, mask ratio 0.75, AdamW(0.9, 0.95) warmup-cosine. Measures the
full train step (loss fwd+bwd+optimizer) scan-amortized over INNER steps
per dispatch (round-2 methodology: amortizes the ~1 ms/dispatch relay
overhead), timed via a device->host scalar readback.

Configs compared (round-4 BASELINE.md SSL-table levers):
  he+optax       round-2/3 recorded config: He-style full-sequence decoder,
                 leaf-wise optax AdamW
  he+flat        He decoder + flat-buffer AdamW (train/optim.py)
  crossmae+optax masked-query decoder (decode_masked_only=True) + optax AdamW
                 -- the round-4 production config (config/model/mae_vit.yaml;
                 flat AdamW measured SLOWER than optax for SSL, so the
                 Trainer no longer sets it)
  crossmae+flat  masked-query decoder + flat AdamW (recorded for the table)

Usage: python scripts/bench_ssl.py [--models small base] [--inner 10]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from m3l_tpu.models import vit_base, vit_large, vit_small
from m3l_tpu.ssl import MAEModule

INNER_DEFAULT = 10
BATCH = 64  # reference mae_vit.yaml batch; override with --batch for smokes


def build(model: str, decode_masked_only: bool, flat: bool) -> tuple[MAEModule, "nnx.Optimizer"]:
    import contextlib

    # Eager nnx construction issues one remote compile per init-op shape on
    # the relayed TPU — ~minutes for ViT-large. Init on the host CPU backend
    # when available (run with JAX_PLATFORMS=axon,cpu) and let the first
    # jitted step transfer the params; numerics are identical.
    try:
        ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
    except Exception:
        ctx = contextlib.nullcontext()
    with ctx:
        factory = {"small": vit_small, "base": vit_base, "large": vit_large}[model]
        enc = factory(img_size=(224, 224), in_chans=6, pos_embed_fn="sinusoidal", dtype=jnp.bfloat16, rngs=nnx.Rngs(0))
        mae = MAEModule(
            enc,
            mask_ratio=0.75,
            decode_masked_only=decode_masked_only,
            dtype=jnp.bfloat16,
            rngs=nnx.Rngs(1),
        )
        if flat:
            mae._flat_optimizer = True  # opt-in only: measured slower than optax for SSL (round 4)
        tx = mae.configure_optimizer(1000, 200)
        opt = nnx.Optimizer(mae, tx, wrt=mae.trainable_filter)
    return mae, opt


def bench(model: str, decode_masked_only: bool, flat: bool, inner: int, batch: int) -> float:
    mae, opt = build(model, decode_masked_only, flat)
    trainable = mae.trainable_filter
    graphdef, state = nnx.split((mae, opt))
    x = jnp.asarray(np.random.default_rng(0).random((batch, 224, 224, 6), dtype=np.float32))

    @jax.jit
    def run(state, keys):
        def step(state, key):
            module, optimizer = nnx.merge(graphdef, state)
            (loss, aux), grads = nnx.value_and_grad(
                lambda m: m.training_loss({"image": x}, key, jnp.asarray(0)),
                has_aux=True,
                argnums=nnx.DiffState(0, trainable),
            )(module)
            optimizer.update(module, grads)
            module.on_train_batch_end(aux, jnp.asarray(0))
            _, state = nnx.split((module, optimizer))
            return state, loss

        state, losses = jax.lax.scan(step, state, keys)
        return state, losses

    keys = jax.random.split(jax.random.PRNGKey(0), inner)
    state, losses = run(state, keys)  # compile + warm
    float(losses[-1])
    t0 = time.time()
    state, losses = run(state, keys)
    float(losses[-1])  # real readback sync (relay: block_until_ready lies)
    ms = (time.time() - t0) / inner * 1e3
    return ms


def step_flops(model: str, decode_masked_only: bool, flat: bool, batch: int) -> float:
    """Compiled-FLOPs for ONE train step via AOT lower+compile+cost_analysis
    (chipless on the relay — safe while a training run owns the chip)."""
    mae, opt = build(model, decode_masked_only, flat)
    trainable = mae.trainable_filter
    graphdef, state = nnx.split((mae, opt))
    x = jnp.asarray(np.random.default_rng(0).random((batch, 224, 224, 6), dtype=np.float32))

    @jax.jit
    def one_step(state, key):
        module, optimizer = nnx.merge(graphdef, state)
        (loss, aux), grads = nnx.value_and_grad(
            lambda m: m.training_loss({"image": x}, key, jnp.asarray(0)),
            has_aux=True,
            argnums=nnx.DiffState(0, trainable),
        )(module)
        optimizer.update(module, grads)
        module.on_train_batch_end(aux, jnp.asarray(0))
        _, state = nnx.split((module, optimizer))
        return state, loss

    ca = one_step.lower(state, jax.random.PRNGKey(0)).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


PEAK_FLOPS_BF16 = 197e12  # TPU v5e per-chip bf16 peak


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["small", "base"])
    ap.add_argument("--inner", type=int, default=INNER_DEFAULT)
    ap.add_argument("--configs", nargs="+", default=["he+optax", "crossmae+optax"])
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--mfu", action="store_true", help="AOT compiled-FLOPs only (no execution); combine with --ms")
    ap.add_argument("--ms", nargs="+", type=float, default=None, help="with --mfu: measured ms/step per model (skips timing)")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    for i, model in enumerate(args.models):
        for cfg in args.configs:
            masked = cfg.startswith("crossmae")
            flat = cfg.endswith("flat")
            if args.mfu:
                flops = step_flops(model, masked, flat, args.batch)
                line = f"MAE ViT-{model:5s} {cfg:14s} {flops / 1e9:8.1f} GFLOP/step"
                if args.ms:
                    ms = args.ms[i]
                    mfu = flops / (ms / 1e3) / PEAK_FLOPS_BF16
                    line += f"  @ {ms:.1f} ms -> {flops / (ms / 1e3) / 1e12:5.1f} TFLOP/s, MFU {mfu:.3f}"
                print(line, flush=True)
                continue
            ms = bench(model, masked, flat, args.inner, args.batch)
            fps = args.batch / ms * 1e3
            print(f"MAE ViT-{model:5s} {cfg:14s} {ms:7.1f} ms/step  {fps:8.0f} obs-frames/s/chip", flush=True)


if __name__ == "__main__":
    main()
