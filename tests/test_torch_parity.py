"""Cross-framework parity: JAX VTMAE loss == independent torch mirror.

The flagship masked-recon loss is computed twice on the SAME weights
(transplanted), SAME batch, and SAME injected mask permutation — once by the
framework, once by a from-scratch torch implementation of the documented
math (tests/torch_mirror.py). Matching to ~1e-5 relative demonstrates the
"bit-comparable recon losses on fixed batches" contract (BASELINE.json).
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from m3l_tpu.models import VTT, VTTConfig, VTMAE
from m3l_tpu.ops.masking import ModalMask, gather_tokens, restore_tokens


def build_mae():
    rngs = nnx.Rngs(0)
    cfg = VTTConfig(dim=64, depth=2, heads=2, mlp_dim=128, num_tactiles=2, frame_stack=1)
    mae = VTMAE(VTT(cfg, rngs=rngs), decoder_dim=64, masking_ratio=0.95, decoder_depth=2, decoder_heads=2, early_conv_masking=True, rngs=rngs)
    return mae, cfg


def flat_params(module):
    out = {}
    for path, var in nnx.to_flat_state(nnx.state(module, nnx.Param)):
        out["/".join(str(p) for p in path)] = np.asarray(var.get_value() if hasattr(var, "get_value") else var)
    return out


def jax_loss_with_injected_mask(mae, batch, mask: ModalMask):
    """Re-run the VTMAE forward path with a FIXED mask realisation."""
    x = {k: jnp.asarray(v) for k, v in batch.items()}
    image_patches, tactile_patches = mae._raw_patches(x, True, True)
    tokens = mae._tokens(x, True, True, image_patches, tactile_patches)
    kept = gather_tokens(tokens, mask.unmasked_idx)
    encoded = mae.encoder.transformer(kept)
    dec_tok = mae.enc_to_dec(encoded) if mae.enc_to_dec is not None else encoded
    full = restore_tokens(dec_tok, mae.mask_token[...], mask)
    full = mae._decoder_modpos(full, True, True)
    decoded = mae.decoder(full)
    n_img = mae.config.num_image_patches
    pred_tac = mae.to_tactiles(decoded[:, n_img:])
    pred_img = mae.to_pixels(decoded[:, :n_img])
    loss = 10.0 * jnp.mean((pred_tac - tactile_patches) ** 2) + jnp.mean((pred_img - image_patches) ** 2)
    return float(loss)


def test_jax_torch_loss_parity():
    from tests.torch_mirror import TorchMirrorVTMAE

    mae, cfg = build_mae()
    rng = np.random.default_rng(42)
    batch = {
        "image": rng.random((2, 64, 64, 3), dtype=np.float32),
        "tactile1": rng.random((2, 32, 32, 3), dtype=np.float32),
        "tactile2": rng.random((2, 32, 32, 3), dtype=np.float32),
    }
    # one fixed mask realisation (same counts as the flagship: 95% of 192)
    sizes, masked = [64, 64, 64], [60, 61, 61]
    masked_parts, unmasked_parts, off = [], [], 0
    for n, m in zip(sizes, masked):
        perm = rng.permutation(n) + off
        masked_parts.append(perm[:m])
        unmasked_parts.append(perm[m:])
        off += n
    masked_idx = np.tile(np.concatenate(masked_parts)[None], (2, 1))
    unmasked_idx = np.tile(np.concatenate(unmasked_parts)[None], (2, 1))
    combined = np.concatenate([unmasked_idx, masked_idx], axis=1)
    mask = ModalMask(jnp.asarray(masked_idx), jnp.asarray(unmasked_idx), jnp.asarray(np.argsort(combined, axis=1)))

    jax_loss = jax_loss_with_injected_mask(mae, batch, mask)

    pos_tables = {
        "img_enc": np.asarray(mae._img_pos_enc)[0],
        "tac_enc": np.asarray(mae._tac_pos_enc)[0],
        "img_dec": np.asarray(mae._img_pos_dec)[0],
        "tac_dec": np.asarray(mae._tac_pos_dec)[0],
    }
    mirror = TorchMirrorVTMAE(flat_params(mae), cfg, masking_ratio=0.95, early_conv=True, decoder_depth=2, decoder_heads=2)
    torch_loss = mirror.forward_loss(batch, masked_idx, unmasked_idx, pos_tables)

    rel = abs(jax_loss - torch_loss) / max(abs(torch_loss), 1e-9)
    assert rel < 1e-4, f"jax={jax_loss} torch={torch_loss} rel={rel}"


def test_policy_heads_parity():
    """Action mean + value parity through the full extractor+heads path."""
    from flax import nnx as _nnx

    from m3l_tpu.rl import ActorCritic, MAEFeatures
    from tests.torch_mirror import TorchMirrorPolicy

    mae, cfg = build_mae()
    rngs = _nnx.Rngs(5)
    feats = MAEFeatures(mae, cfg.dim, frame_stack=1, rngs=rngs)
    policy = ActorCritic(feats, cfg.dim, 3, rngs=rngs)

    rng = np.random.default_rng(7)
    batch = {
        "image": rng.random((2, 64, 64, 3), dtype=np.float32),
        "tactile1": rng.random((2, 32, 32, 3), dtype=np.float32),
        "tactile2": rng.random((2, 32, 32, 3), dtype=np.float32),
    }
    x = {k: jnp.asarray(v) for k, v in batch.items()}
    mean_jax, log_std, value_jax = policy._heads(policy.features.from_packed(x))

    # flatten params with paths relative to the mirror's naming
    params = {}
    for path, var in nnx.to_flat_state(nnx.state(policy, nnx.Param)):
        key = "/".join(str(p) for p in path)
        key = key.replace("features/mae/", "").replace("features/post/", "post/")
        params[key] = np.asarray(var.get_value() if hasattr(var, "get_value") else var)
    pos_tables = {
        "img_enc": np.asarray(mae._img_pos_enc)[0],
        "tac_enc": np.asarray(mae._tac_pos_enc)[0],
    }
    mirror = TorchMirrorPolicy(params, cfg, masking_ratio=0.95, early_conv=True, decoder_depth=2, decoder_heads=2)
    mean_t, value_t = mirror.policy_heads(batch, pos_tables, post_depth=1, post_heads=4)
    np.testing.assert_allclose(np.asarray(mean_jax), mean_t.detach().numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(value_jax), value_t.detach().numpy(), rtol=2e-4, atol=2e-5)
