import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from m3l_tpu.models.vtt import VTT, VTTConfig
from m3l_tpu.models.vtmae import VTMAE


def tiny_config(num_tactiles=2, frame_stack=1):
    return VTTConfig(
        image_size=(64, 64),
        tactile_size=(32, 32),
        image_patch_size=8,
        tactile_patch_size=4,
        dim=64,
        depth=2,
        heads=2,
        mlp_dim=128,
        num_tactiles=num_tactiles,
        frame_stack=frame_stack,
    )


def make_mae(early_conv=True, sincosmod=True, num_tactiles=2, frame_stack=1, ratio=0.95, dtype=jnp.float32):
    cfg = tiny_config(num_tactiles, frame_stack)
    rngs = nnx.Rngs(0)
    enc = VTT(cfg, dtype=dtype, rngs=rngs)
    return VTMAE(
        enc,
        decoder_dim=64,
        masking_ratio=ratio,
        decoder_depth=1,
        decoder_heads=2,
        early_conv_masking=early_conv,
        use_sincosmod_encodings=sincosmod,
        dtype=dtype,
        rngs=rngs,
    )


def batch(num_tactiles=2, frame_stack=1, b=2, seed=0):
    rng = np.random.default_rng(seed)
    x = {"image": jnp.asarray(rng.random((b, 64, 64, 3 * frame_stack), dtype=np.float32))}
    for i in range(num_tactiles):
        x[f"tactile{i + 1}"] = jnp.asarray(rng.random((b, 32, 32, 3 * frame_stack), dtype=np.float32))
    return x


@pytest.mark.parametrize("early_conv", [True, False])
@pytest.mark.parametrize("sincosmod", [True, False])
def test_forward_loss_finite(early_conv, sincosmod):
    mae = make_mae(early_conv=early_conv, sincosmod=sincosmod)
    loss = mae(batch(), jax.random.PRNGKey(0))
    assert loss.shape == ()
    assert bool(jnp.isfinite(loss))
    assert float(loss) > 0


def test_forward_jit_and_grad():
    mae = make_mae()
    graphdef, state = nnx.split(mae)

    @jax.jit
    def loss_fn(state, x, key):
        model = nnx.merge(graphdef, state)
        return model(x, key)

    x = batch()
    key = jax.random.PRNGKey(1)
    loss = loss_fn(state, x, key)
    grads = jax.jit(jax.grad(loss_fn))(state, x, key)
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    # encoder transformer must receive gradient
    flat = nnx.to_flat_state(grads)
    g_enc = [v for k, v in flat if "encoder" in str(k) and "transformer" in str(k)]
    assert g_enc and any(float(jnp.abs(g).max()) > 0 for g in g_enc)


def test_get_embeddings_shape():
    mae = make_mae()
    emb = mae.get_embeddings(batch())
    assert emb.shape == (2, 192, 64)
    emb_v = mae.get_embeddings(batch(), use_tactile=False)
    assert emb_v.shape == (2, 64, 64)


def test_tactile_only_and_vision_only():
    mae = make_mae()
    x = batch()
    loss_v = mae({"image": x["image"]}, jax.random.PRNGKey(0), use_tactile=False)
    assert bool(jnp.isfinite(loss_v))
    x_t = {k: v for k, v in x.items() if k != "image"}
    loss_t = mae(x_t, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(loss_t))


def test_framestack4_shapes():
    mae = make_mae(frame_stack=4)
    loss = mae(batch(frame_stack=4), jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(loss))
    emb = mae.get_embeddings(batch(frame_stack=4))
    assert emb.shape == (2, 192, 64)


def test_tactile_loss_weighted_10x():
    """With identical modality errors the tactile term dominates 10:1 —
    checked indirectly: zeroing tactile inputs vs zeroing image inputs moves
    the loss by very different magnitudes (reference quirk at
    pretrain_models.py:320,338)."""
    mae = make_mae(early_conv=True, ratio=0.5)
    x = batch()
    key = jax.random.PRNGKey(0)
    l_both = float(mae(x, key))
    l_vision_only = float(mae(x, key, use_tactile=False))
    l_tactile_only = float(mae({k: v for k, v in x.items() if k != "image"}, key))
    # both-loss should be near vision-loss + tactile-loss scale; tactile part >> vision part
    assert l_tactile_only > l_vision_only


def test_reconstruct_outputs():
    mae = make_mae(early_conv=False, ratio=0.75)
    out = mae.reconstruct(batch(), jax.random.PRNGKey(0))
    assert out["image_rec"].shape == (2, 64, 64, 3)
    assert out["image_masked"].shape == (2, 64, 64, 3)
    assert out["tactile_rec"].shape == (2, 2, 32, 32, 3)
    assert bool(jnp.isfinite(out["recon_loss_image"]))
    assert bool(jnp.isfinite(out["recon_loss_tactile"]))
    # masked viz uses inf markers on tactile (reference :480-483)
    assert bool(jnp.isinf(out["tactile_masked"]).any())


def test_masked_loss_only_covers_masked_patches():
    """Patch path: perfect reconstruction of *unmasked* patches is irrelevant;
    loss only depends on masked-patch predictions (reference :324-340)."""
    mae = make_mae(early_conv=False, ratio=0.5)
    x = batch()
    l1 = float(mae(x, jax.random.PRNGKey(0)))
    l2 = float(mae(x, jax.random.PRNGKey(7)))
    assert l1 != l2  # different masks -> different loss


def test_bfloat16_compute_path():
    mae = make_mae(dtype=jnp.bfloat16)
    loss = mae(batch(), jax.random.PRNGKey(0))
    assert loss.dtype == jnp.float32  # loss accumulated in fp32
    assert bool(jnp.isfinite(loss))


def test_vision_only_no_tactiles():
    """num_tactiles=0 (MuJoCoPixels --state_type vision): the modality
    embedding table has a single row, which crashed flax nnx.Embed's
    num_embeddings==1 scalar-index special case before the static
    row-indexing fix. Forward loss + embeddings must work and be finite."""
    mae = make_mae(num_tactiles=0)
    x = {"image": batch(num_tactiles=0)["image"]}
    loss = mae(x, jax.random.PRNGKey(0))
    assert jnp.isfinite(loss)
    emb = mae.get_embeddings(x)
    cfg = mae.config
    assert emb.shape == (2, cfg.num_image_patches, cfg.dim)
    assert bool(jnp.all(jnp.isfinite(emb)))
