"""Per-piece timing of the fused PPO+MAE minibatch update on the real chip.

Decomposes one flagship minibatch (B=512, dim 256, fs 4, mask .95, bf16) into:
encoder fwd / encoder fwd+bwd / PPO branch / MAE branch / fused joint, each
timed via a scan of `inner` iterations per dispatch with a device->host
scalar readback (the relay's block_until_ready returns early — CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_update.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from m3l_tpu.models import VTT, VTTConfig, VTMAE
from m3l_tpu.rl import ActorCritic, MAEFeatures
from m3l_tpu.utils.obs import vt_load

B, DIM, FS, INNER = 512, 256, 4, 10


def timed(name, fn, *args):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum() if hasattr(jax.tree.leaves(out)[0], "sum") else out)
    t0 = time.time()
    out = fn(*args)
    float(jax.tree.leaves(out)[0].sum() if hasattr(jax.tree.leaves(out)[0], "sum") else out)
    dt = (time.time() - t0) / INNER * 1e3
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


def main():
    rngs = nnx.Rngs(0)
    dtype = jnp.bfloat16
    vtt = VTT(
        VTTConfig(dim=DIM, depth=4, heads=4, mlp_dim=2 * DIM, num_tactiles=2, frame_stack=FS),
        dtype=dtype,
        rngs=rngs,
    )
    mae = VTMAE(vtt, masking_ratio=0.95, decoder_dim=DIM, decoder_depth=3, decoder_heads=4,
                early_conv_masking=True, dtype=dtype, rngs=rngs)
    features = MAEFeatures(mae, DIM, frame_stack=FS, dtype=dtype, rngs=rngs)
    policy = ActorCritic(features, DIM, 3, dtype=dtype, rngs=rngs)
    graphdef, mae_params, other_params, rest = nnx.split(policy, nnx.All(nnx.Param, nnx.PathContains("mae")), nnx.Param, ...)

    rng = np.random.default_rng(0)
    obs = {
        "image": rng.integers(0, 255, (B, 64, 64, 3 * FS), dtype=np.uint8).astype(np.float32) / 255.0,
        "tactile": rng.normal(size=(B, 6 * FS, 32, 32)).astype(np.float32),
    }
    x = vt_load(obs, frame_stack=FS)
    x = jax.device_put(x)
    actions = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    key = jax.random.key(0)
    tx = optax.adam(3e-4)
    opt = tx.init((mae_params, other_params))

    def scan_time(body, init_args):
        """Run `body` INNER times in one dispatch via lax.scan."""
        def wrapped(args):
            def step(c, _):
                return body(c), ()
            c, _ = jax.lax.scan(step, args, None, length=INNER)
            return c
        return jax.jit(wrapped), init_args

    # 1. encoder fwd only (full sequence, PPO-style)
    def enc_fwd(c):
        mp, op = c
        model = nnx.merge(graphdef, mp, op, rest)
        v, lp, ent = model.evaluate_actions_packed(x, actions)
        return (jax.tree.map(lambda a: a + 0 * v.sum().astype(a.dtype), mp), op)

    f, a = scan_time(enc_fwd, (mae_params, other_params))
    timed("PPO fwd (evaluate_actions_packed)", f, a)

    # 2. PPO fwd+bwd+adam
    def ppo_step(c):
        mp, op, o = c
        def loss(params):
            model = nnx.merge(graphdef, params[0], params[1], rest)
            v, lp, ent = model.evaluate_actions_packed(x, actions)
            adv = jnp.ones_like(lp)
            ratio = jnp.exp(lp - jax.lax.stop_gradient(lp) + 0.01)
            return (-(adv * ratio).mean() + v.mean() ** 2 - 0.01 * ent.mean())
        g = jax.grad(loss)((mp, op))
        upd, o = tx.update(g, o, (mp, op))
        mp, op = optax.apply_updates((mp, op), upd)
        return (mp, op, o)

    f, a = scan_time(ppo_step, (mae_params, other_params, opt))
    timed("PPO fwd+bwd+adam", f, a)

    # 3. MAE fwd+bwd+adam
    def mae_step(c):
        mp, op, o, k = c
        k, k2 = jax.random.split(k)
        def loss(params):
            model = nnx.merge(graphdef, params[0], params[1], rest)
            return model.features.mae_loss(x, k2)
        g = jax.grad(loss)((mp, op))
        upd, o = tx.update(g, o, (mp, op))
        mp, op = optax.apply_updates((mp, op), upd)
        return (mp, op, o, k)

    f, a = scan_time(mae_step, (mae_params, other_params, opt, key))
    timed("MAE fwd+bwd+adam", f, a)

    # 4. fused joint (shared pipeline)
    def joint_step(c):
        mp, op, o, k = c
        k, k2 = jax.random.split(k)
        def loss(params):
            model = nnx.merge(graphdef, params[0], params[1], rest)
            v, lp, ent, ml = model.evaluate_actions_packed_with_mae(x, actions, k2)
            adv = jnp.ones_like(lp)
            ratio = jnp.exp(lp - jax.lax.stop_gradient(lp) + 0.01)
            return (-(adv * ratio).mean() + v.mean() ** 2 - 0.01 * ent.mean()) + ml
        g = jax.grad(loss)((mp, op))
        upd, o = tx.update(g, o, (mp, op))
        mp, op = optax.apply_updates((mp, op), upd)
        return (mp, op, o, k)

    f, a = scan_time(joint_step, (mae_params, other_params, opt, key))
    timed("fused joint fwd+bwd+adam", f, a)

    # 5. adam-only (tree traffic at 13M params; the fused-optimizer lever)
    fixed_g = jax.tree.map(lambda p: jnp.full_like(p, 1e-6), (mae_params, other_params))

    def adam_only(c):
        mp, op, o = c
        upd, o = tx.update(fixed_g, o, (mp, op))
        mp, op = optax.apply_updates((mp, op), upd)
        return (mp, op, o)

    f, a = scan_time(adam_only, (mae_params, other_params, opt))
    timed("adam update only", f, a)

    # 6. token pipeline fwd (EarlyCNN + embeds)
    def tok_fwd(c):
        mp, op = c
        model = nnx.merge(graphdef, mp, op, rest)
        m = model.features.mae
        ip, tp = m._raw_patches(x, True, True)
        tok = m._tokens(x, True, True, ip, tp)
        return (jax.tree.map(lambda a_: a_ + 0 * tok.sum().astype(a_.dtype), mp), op)

    f, a = scan_time(tok_fwd, (mae_params, other_params))
    timed("token pipeline fwd", f, a)

if __name__ == "__main__":
    main()
