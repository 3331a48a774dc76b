import jax
import jax.numpy as jnp
import numpy as np

from m3l_tpu.ops.masking import gather_tokens, random_modal_masking, restore_tokens


def test_mask_partition_and_ranges():
    key = jax.random.PRNGKey(0)
    sizes, masked = [64, 64, 64], [57, 30, 30]
    mask = random_modal_masking(key, 4, sizes, masked)
    assert mask.masked_idx.shape == (4, 117)
    assert mask.unmasked_idx.shape == (4, 75)
    for b in range(4):
        all_idx = np.sort(np.concatenate([mask.masked_idx[b], mask.unmasked_idx[b]]))
        np.testing.assert_array_equal(all_idx, np.arange(192))
    # per-segment containment: first 57 masked indices are image (0..63)
    assert (np.asarray(mask.masked_idx[:, :57]) < 64).all()
    assert (np.asarray(mask.masked_idx[:, 57:87]) >= 64).all()
    assert (np.asarray(mask.masked_idx[:, 57:87]) < 128).all()
    assert (np.asarray(mask.masked_idx[:, 87:]) >= 128).all()


def test_restore_roundtrip():
    key = jax.random.PRNGKey(1)
    b, n, d = 3, 48, 16
    tokens = jax.random.normal(jax.random.PRNGKey(2), (b, n, d))
    mask = random_modal_masking(key, b, [16, 16, 16], [12, 8, 8])
    kept = gather_tokens(tokens, mask.unmasked_idx)
    mask_token = jnp.full((d,), -7.0)
    full = restore_tokens(kept, mask_token, mask)
    full = np.asarray(full)
    tokens = np.asarray(tokens)
    for bi in range(b):
        for i in np.asarray(mask.unmasked_idx[bi]):
            np.testing.assert_allclose(full[bi, i], tokens[bi, i], rtol=1e-6)
        for i in np.asarray(mask.masked_idx[bi]):
            np.testing.assert_allclose(full[bi, i], -7.0)


def test_mask_randomness_across_keys():
    m1 = random_modal_masking(jax.random.PRNGKey(0), 2, [64], [32])
    m2 = random_modal_masking(jax.random.PRNGKey(3), 2, [64], [32])
    assert not np.array_equal(np.asarray(m1.masked_idx), np.asarray(m2.masked_idx))
