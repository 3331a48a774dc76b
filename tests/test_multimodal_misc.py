"""Multimodal transformer, Gumbel VQ, CNN baselines, distributed helpers."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from m3l_tpu.models import MultimodalMAEDecoder, MultimodalTransformer, ResNet18Encoder, AlexNetEncoder
from m3l_tpu.nn import GumbelVectorQuantizer


def test_multimodal_transformer_shared():
    mt = MultimodalTransformer([8, 12], [10, 6], 32, depth=2, num_heads=2, num_register_tokens=1, pos_embed_fn="sinusoidal", rngs=nnx.Rngs(0))
    xs = [jnp.ones((2, 10, 8)), jnp.ones((2, 6, 12))]
    out = mt.forward_features(xs)
    assert out["x_norm_patchtokens"].shape == (2, 16, 32)
    assert out["x_norm_regtokens"].shape == (2, 1, 32)


def test_multimodal_transformer_factored():
    mt = MultimodalTransformer([8, 8], [4, 4], 32, depth=2, num_heads=2, num_register_tokens=1, shared_attn=False, pos_embed_fn="sinusoidal", rngs=nnx.Rngs(0))
    xs = [jnp.ones((2, 4, 8)), jnp.ones((2, 4, 8))]
    out = mt.forward_features(xs)
    assert out["x_norm_patchtokens"].shape == (2, 8, 32)


def test_multimodal_transformer_mask_gather():
    mt = MultimodalTransformer([8], [10], 32, depth=1, num_heads=2, pos_embed_fn="sinusoidal", rngs=nnx.Rngs(0))
    xs = [jnp.ones((2, 10, 8))]
    idx = jnp.tile(jnp.arange(4)[None], (2, 1))
    out = mt.forward_features(xs, mask_indices=[idx])
    assert out["x_norm_patchtokens"].shape == (2, 4, 32)


def test_multimodal_mae_decoder_restore():
    dec = MultimodalMAEDecoder([8, 8], [6, 6], 32, depth=1, num_heads=2, pos_embed_fn="sinusoidal", rngs=nnx.Rngs(0))
    xs = [jnp.ones((2, 2, 8)), jnp.ones((2, 3, 8))]
    ids = [jnp.tile(jnp.arange(6)[None], (2, 1)), jnp.tile(jnp.arange(6)[None], (2, 1))]
    outs = dec(xs, ids)
    assert outs[0].shape == (2, 6, 8) and outs[1].shape == (2, 6, 8)


def test_gumbel_vq():
    vq = GumbelVectorQuantizer(16, num_vars=8, groups=2, vq_dim=8, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16))
    out = vq(x, jax.random.PRNGKey(1), step=0, training=True)
    assert out["quantized"].shape == (2, 5, 8)
    assert 1.0 <= float(out["perplexity"]) <= 16.0
    # eval mode deterministic
    e1 = vq(x, jax.random.PRNGKey(2), training=False)["quantized"]
    e2 = vq(x, jax.random.PRNGKey(3), training=False)["quantized"]
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    # gradient flows through straight-through estimator
    def loss(state):
        m = nnx.merge(gd, state)
        return jnp.sum(m(x, jax.random.PRNGKey(1), training=True)["quantized"] ** 2)
    gd, state = nnx.split(vq)
    grads = jax.grad(loss)(state)
    assert max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)) > 0


def test_cnn_baselines():
    r18 = ResNet18Encoder(in_chans=6, rngs=nnx.Rngs(0))
    x = jnp.ones((2, 64, 64, 6))
    feats = r18(x)
    assert feats.shape == (2, 512)
    tokens = r18.forward_features(x)["x_norm_patchtokens"]
    assert tokens.shape[0] == 2 and tokens.shape[2] == 512
    alex = AlexNetEncoder(in_chans=6, rngs=nnx.Rngs(0))
    x2 = jnp.ones((2, 224, 224, 6))
    assert alex(x2).shape == (2, 256)


def test_distributed_helpers_single_process(monkeypatch):
    from m3l_tpu.train import get_local_rank, get_world_size, initialize_distributed, is_main_process

    for var in ("SLURM_PROCID", "RANK", "SLURM_NTASKS", "WORLD_SIZE"):
        monkeypatch.delenv(var, raising=False)
    assert get_local_rank() == 0 and get_world_size() == 1
    assert is_main_process()
    assert initialize_distributed() is False
    monkeypatch.setenv("SLURM_PROCID", "3")
    monkeypatch.setenv("SLURM_NTASKS", "8")
    assert get_local_rank() == 3 and get_world_size() == 8
