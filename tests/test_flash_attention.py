"""Pallas flash-attention kernel vs the einsum reference (interpret mode on
CPU; the real kernel runs on TPU only)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3l_tpu.nn.flash_attention import flash_attention


def einsum_attention(q, k, v, key_mask=None, scale=None):
    scale = scale or q.shape[-1] ** -0.5
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    s = s.astype(jnp.float32)
    if key_mask is not None:
        s = s + jnp.where(key_mask[:, None, None, :], 0.0, -1e30)
    a = jax.nn.softmax(s, -1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", a, v)


def _qkv(b=4, n=192, h=4, dh=64, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, n, h, dh)), jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("n", [192, 17, 64])
def test_flash_matches_einsum_fwd(n):
    q, k, v = _qkv(n=n)
    out = flash_attention(q, k, v, interpret=True)
    ref = einsum_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_flash_matches_einsum_grads():
    q, k, v = _qkv()
    f_ref = lambda q, k, v: jnp.sum(jnp.sin(einsum_attention(q, k, v)))
    f_fl = lambda q, k, v: jnp.sum(jnp.sin(flash_attention(q, k, v, interpret=True)))
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(f_fl, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_flash_key_mask():
    q, k, v = _qkv()
    rng = np.random.default_rng(1)
    mask = jnp.asarray(rng.random((4, 192)) > 0.4)
    out = flash_attention(q, k, v, key_mask=mask, interpret=True)
    ref = einsum_attention(q, k, v, key_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)
    g_ref = jax.grad(lambda q: jnp.sum(jnp.sin(einsum_attention(q, k, v, mask))))(q)
    g_fl = jax.grad(lambda q: jnp.sum(jnp.sin(flash_attention(q, k, v, key_mask=mask, interpret=True))))(q)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_fl), atol=2e-6)


def test_shared_pipeline_matches_separate():
    """features_and_mae_loss == (from_packed, mae_loss) with the same key
    (the fused PPO update's redundancy fix must not change numerics)."""
    from flax import nnx

    from m3l_tpu.models import VTT, VTTConfig, VTMAE
    from m3l_tpu.rl import MAEFeatures

    rngs = nnx.Rngs(0)
    cfg = VTTConfig(dim=64, depth=1, heads=2, mlp_dim=128, num_tactiles=2, frame_stack=2)
    mae = VTMAE(VTT(cfg, rngs=rngs), decoder_dim=64, masking_ratio=0.75, decoder_depth=1, decoder_heads=2, early_conv_masking=True, rngs=rngs)
    feats = MAEFeatures(mae, cfg.dim, frame_stack=2, rngs=rngs)
    rng = np.random.default_rng(0)
    x = {
        "image": jnp.asarray(rng.random((3, 64, 64, 6), np.float32)),
        "tactile1": jnp.asarray(rng.random((3, 32, 32, 6), np.float32)),
        "tactile2": jnp.asarray(rng.random((3, 32, 32, 6), np.float32)),
    }
    key = jax.random.PRNGKey(7)
    f_shared, l_shared = feats.features_and_mae_loss(x, key)
    f_sep = feats.from_packed(x)
    l_sep = feats.mae_loss(x, key)
    np.testing.assert_allclose(np.asarray(f_shared), np.asarray(f_sep), atol=1e-5)
    np.testing.assert_allclose(float(l_shared), float(l_sep), atol=1e-5)


# ---------------------------------------------------------------------- #
# v2: qkv-fused kernel (packed (B, N, 3*H*Dh) in, (B, N, H*Dh) out)
# ---------------------------------------------------------------------- #
def _packed(b=4, n=192, h=4, dh=64, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, n, 3 * h * dh)), jnp.float32), h, dh


def _einsum_from_packed(qkv, h, dh, key_mask=None):
    b, n, _ = qkv.shape
    x = qkv.reshape(b, n, 3, h, dh)
    return einsum_attention(x[:, :, 0], x[:, :, 1], x[:, :, 2], key_mask=key_mask).reshape(b, n, h * dh)


@pytest.mark.parametrize("n,h", [(192, 4), (17, 2), (64, 1)])
def test_flash_qkv_matches_einsum_fwd(n, h):
    from m3l_tpu.nn.flash_attention import flash_attention_qkv

    qkv, _, dh = _packed(n=n, h=h, dh=64)
    out = flash_attention_qkv(qkv, h, interpret=True)
    ref = _einsum_from_packed(qkv, h, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_flash_qkv_matches_einsum_grads_and_mask():
    from m3l_tpu.nn.flash_attention import flash_attention_qkv

    qkv, h, dh = _packed()
    rng = np.random.default_rng(1)
    mask = jnp.asarray(rng.uniform(size=qkv.shape[:2]) > 0.3)
    for m in (None, mask):
        f_ref = lambda q: jnp.sum(jnp.sin(_einsum_from_packed(q, h, dh, key_mask=m)))
        f_fl = lambda q: jnp.sum(jnp.sin(flash_attention_qkv(q, h, key_mask=m, interpret=True)))
        np.testing.assert_allclose(
            np.asarray(jax.grad(f_fl)(qkv)), np.asarray(jax.grad(f_ref)(qkv)), atol=5e-5
        )


def test_fit_block_respects_vmem_budget():
    """The block chooser keeps the measured-fastest RL blocks but shrinks for
    head-heavy shapes whose f32 score buffers overflow scoped VMEM (the SSL
    MAE decoder at heads=16, N=196 needed 39.3 MB vs the 16 MB default)."""
    from m3l_tpu.nn.flash_attention import _fit_block, _rup, _VMEM_BUDGET

    # RL flagship fwd shape: unchanged fast path
    assert _fit_block(512, 192, 4, 8, 2.0) == 8
    # SSL decoder fwd/bwd shrink to fit
    for limit, copies in ((8, 2.0), (4, 3.0)):
        g = _fit_block(64, 196, 16, limit, copies)
        assert g >= 1
        scores = 16 * g * _rup(196, 8) * _rup(196, 128) * 4
        assert g == 1 or copies * scores <= _VMEM_BUDGET
    # b with no nontrivial divisor under budget still returns a divisor
    assert _fit_block(7, 4096, 16, 8, 3.0) == 1
