"""Multimodal VTT, VTDINO, frozen-DINO PPO, fusion extractors, CNN variant."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from m3l_tpu.models import VTT, VTTConfig, MultimodalVTT, VTMAECnn, dinov2_vits14
from m3l_tpu.ssl import VTDINOModule
from m3l_tpu.train import Trainer


def tiny_mm_vtt(**kw):
    defaults = dict(
        image_size=(28, 28), tactile_size=(28, 28), image_patch_size=14, tactile_patch_size=14,
        dim=32, depth=1, heads=2, mlp_dim=64, num_register_tokens=1, rngs=nnx.Rngs(0),
    )
    defaults.update(kw)
    return MultimodalVTT(**defaults)


def mm_batch(b=2, size=28, fs=1, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.random((b, size, size, 3 * fs), dtype=np.float32),
        "tactile1": rng.random((b, size, size, 3 * fs), dtype=np.float32),
        "tactile2": rng.random((b, size, size, 3 * fs), dtype=np.float32),
    }


def test_multimodal_vtt_contract():
    vtt = tiny_mm_vtt()
    out = vtt.forward_features(mm_batch())
    assert out["x_norm_regtokens"].shape == (2, 1, 32)
    assert out["x_norm_patchtokens"].shape == (2, 12, 32)  # 3 modalities x 4 patches


def test_multimodal_vtt_mask_applies_to_all_modalities():
    vtt = tiny_mm_vtt()
    x = mm_batch()
    km = jnp.ones((2, 4), bool).at[:, 2:].set(False)
    out1 = vtt.forward_features(x, key_mask=km)["x_norm_regtokens"]
    # corrupting masked positions of ANY modality must not change registers
    x2 = dict(x)
    x2["tactile2"] = np.array(x["tactile2"])
    x2["tactile2"][:, 14:, :, :] = 9.0  # bottom half = patches 2,3
    out2 = vtt.forward_features(x2, key_mask=km)["x_norm_regtokens"]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_vtdino_trains():
    vtt = tiny_mm_vtt()
    mod = VTDINOModule(vtt, dino_out_dim=64, dino_hidden_dim=32, dino_bottleneck_dim=16, num_local_masks=2, with_reconstruction_probe=True, rngs=nnx.Rngs(1))
    mod.setup_schedules(2, 1)
    batches = [mm_batch(seed=i) for i in range(2)]
    trainer = Trainer(max_epochs=1, verbose=0)
    hist = trainer.fit(mod, batches)
    assert np.isfinite(hist[-1]["train_loss"])
    assert float(jnp.abs(mod.center[...]).max()) > 0


def test_dinov2_backbone_and_loader():
    import torch

    dino = dinov2_vits14(num_register_tokens=4, img_size=(28, 28), depth=2, rngs=nnx.Rngs(0))
    x = jnp.ones((2, 28, 28, 3))
    cls = dino(x)
    assert cls.shape == (2, 384)
    # round-trip a synthetic torch state dict
    sd = {
        "cls_token": torch.zeros(1, 1, 384) + 0.5,
        "register_tokens": torch.zeros(1, 4, 384) + 0.25,
        "pos_embed": torch.zeros(1, 1 + 4, 384) + 0.1,
        "patch_embed.proj.weight": torch.randn(384, 3, 14, 14),
        "patch_embed.proj.bias": torch.zeros(384),
        "norm.weight": torch.ones(384),
        "norm.bias": torch.zeros(384),
    }
    for i in range(2):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": torch.ones(384), p + "norm1.bias": torch.zeros(384),
            p + "attn.qkv.weight": torch.randn(1152, 384) * 0.02, p + "attn.qkv.bias": torch.zeros(1152),
            p + "attn.proj.weight": torch.randn(384, 384) * 0.02, p + "attn.proj.bias": torch.zeros(384),
            p + "ls1.gamma": torch.full((384,), 1e-5),
            p + "norm2.weight": torch.ones(384), p + "norm2.bias": torch.zeros(384),
            p + "mlp.fc1.weight": torch.randn(1536, 384) * 0.02, p + "mlp.fc1.bias": torch.zeros(1536),
            p + "mlp.fc2.weight": torch.randn(384, 1536) * 0.02, p + "mlp.fc2.bias": torch.zeros(384),
            p + "ls2.gamma": torch.full((384,), 1e-5),
        })
    from m3l_tpu.models import load_torch_dinov2_state

    n = load_torch_dinov2_state(dino, sd)
    assert n > 3_000_000
    np.testing.assert_allclose(float(dino.cls_token[...].mean()), 0.5, rtol=1e-6)
    # qkv kernel transposed correctly: (in=384, out=1152)
    np.testing.assert_allclose(
        np.asarray(dino.blocks[0].attn.qkv.kernel[...]),
        sd["blocks.0.attn.qkv.weight"].numpy().T,
        rtol=1e-6,
    )


def test_frozen_features_ppo_no_encoder_update():
    from m3l_tpu.cli.traindino import build_model, build_parser
    from m3l_tpu.envs import SyncVecEnv, make_env

    argv = []
    for k, v in dict(env="FakeInsertion", n_envs=2, rollout_length=64, batch_size=16, ppo_epochs=1,
                     dim_embedding=384, frame_stack=1, compute_dtype="float32", subproc=False, verbose=0).items():
        argv += [f"--{k}", str(v)]
    config = build_parser().parse_args(argv)
    env = SyncVecEnv([make_env(config.env, i, 0, config.state_type, frame_stack=1) for i in range(2)])
    model = build_model(config, env)
    flat_before = {
        "/".join(map(str, p)): np.asarray(v.get_value() if hasattr(v, "get_value") else v).copy()
        for p, v in nnx.to_flat_state(model.other_params)
    }
    model.learn(total_timesteps=64)
    env.close()
    assert np.isfinite(model.last_metrics["policy_loss"])
    assert model.last_metrics["mae_loss"] == 0.0
    flat_after = {
        "/".join(map(str, p)): np.asarray(v.get_value() if hasattr(v, "get_value") else v)
        for p, v in nnx.to_flat_state(model.other_params)
    }
    enc_moved = [np.abs(flat_after[k] - flat_before[k]).max() for k in flat_before if "features/encoder" in k]
    post_moved = [np.abs(flat_after[k] - flat_before[k]).max() for k in flat_before if "features/post" in k]
    assert max(enc_moved) == 0.0, "frozen encoder must not move"
    assert max(post_moved) > 0.0, "trainable post-transformer must move"


def test_dino_cat_mae_ppo_smoke():
    from m3l_tpu.cli.train_dino_cat_mae import build_model, build_parser
    from m3l_tpu.envs import SyncVecEnv, make_env

    argv = []
    for k, v in dict(env="FakeInsertion", n_envs=2, rollout_length=64, batch_size=16, ppo_epochs=1,
                     dim_embedding=32, frame_stack=2, mae_batch_size=8, compute_dtype="float32",
                     subproc=False, verbose=0).items():
        argv += [f"--{k}", str(v)]
    config = build_parser().parse_args(argv)
    env = SyncVecEnv([make_env(config.env, i, 0, config.state_type, frame_stack=2, image_size=70, tactile_size=70) for i in range(2)])
    model = build_model(config, env)
    model.learn(total_timesteps=64)
    env.close()
    m = model.last_metrics
    assert np.isfinite(m["mae_loss"]) and m["mae_loss"] > 0


def test_vtmae_cnn_paths():
    cfg = VTTConfig(dim=32, depth=1, heads=2, mlp_dim=64, num_tactiles=2, frame_stack=1)
    vtt = VTT(cfg, rngs=nnx.Rngs(0))
    mae = VTMAECnn(vtt, decoder_dim=32, masking_ratio=0.9, decoder_depth=1, decoder_heads=2, rngs=nnx.Rngs(0))
    rng = np.random.default_rng(0)
    x = {
        "image": jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32)),
        "tactile1": jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32)),
        "tactile2": jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32)),
    }
    loss = mae(x, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    emb = mae.get_embeddings(x)
    assert emb.shape == (2, 192, 32)  # raw conv tokens, no transformer
    # per-sensor towers differ after independent init? same rngs stream -> they do differ
    k1 = np.asarray(mae.early_conv_tactile_towers[0].conv1.kernel[...])
    k2 = np.asarray(mae.early_conv_tactile_towers[1].conv1.kernel[...])
    assert np.abs(k1 - k2).max() > 0
