"""SSL stack tests: ViT zoo, masks, losses, MAE/DINO modules, trainer."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from m3l_tpu.models.vit import VisionTransformer, vit_predictor
from m3l_tpu.ssl import (
    DINOLossState,
    DINOModule,
    MAEModule,
    dino_cross_entropy,
    koleo_loss,
    sample_block_masks,
    sample_block_masks_constrained,
    sinkhorn_knopp_teacher,
    softmax_center_teacher,
    update_center,
    random_tube_masks,
)
from m3l_tpu.train import Trainer


def tiny_vit(registers=1, **kw):
    defaults = dict(
        img_size=(32, 32), patch_size=8, in_chans=3, embed_dim=32, depth=2, num_heads=2,
        pos_embed_fn="sinusoidal", num_register_tokens=registers, rngs=nnx.Rngs(0),
    )
    defaults.update(kw)
    return VisionTransformer(**defaults)


def test_vit_forward_features_contract():
    vit = tiny_vit(registers=2)
    x = jnp.ones((2, 32, 32, 3))
    out = vit.forward_features(x)
    assert out["x_norm_regtokens"].shape == (2, 2, 32)
    assert out["x_norm_patchtokens"].shape == (2, 16, 32)
    assert out["x_prenorm"].shape == (2, 18, 32)


def test_vit_mask_indices_gather():
    vit = tiny_vit(registers=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    idx = jnp.tile(jnp.arange(8)[None], (2, 1))
    out = vit.forward_features(x, mask_indices=idx)
    assert out["x_norm_patchtokens"].shape == (2, 8, 32)


def test_vit_key_mask_excludes_tokens():
    """Masked keys must not influence register outputs."""
    vit = tiny_vit(registers=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    km = jnp.ones((1, 16), bool).at[0, 8:].set(False)
    out1 = vit.forward_features(x, key_mask=km)["x_norm_regtokens"]
    # corrupt the masked-out region of the input; registers must not change
    x2 = x.at[:, 16:, :, :].set(99.0)  # bottom half = patches 8..15 for 8px patches
    out2 = vit.forward_features(x2, key_mask=km)["x_norm_regtokens"]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_vit_multimask_batching():
    vit = tiny_vit(registers=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    masks = jnp.ones((3, 2, 16), bool)
    out = vit.forward_features_multimask(x, masks)
    assert out["x_norm_regtokens"].shape == (6, 1, 32)
    # with full masks the three views are identical
    r = np.asarray(out["x_norm_regtokens"]).reshape(3, 2, 32)
    np.testing.assert_allclose(r[0], r[1], atol=1e-5)


def test_vit_off_size_input_interpolates_pos():
    vit = tiny_vit(registers=0)
    out = vit.forward_features(jnp.ones((1, 64, 64, 3)))
    assert out["x_norm_patchtokens"].shape == (1, 64, 32)
    learned = tiny_vit(registers=0, pos_embed_fn="learned")
    out2 = learned.forward_features(jnp.ones((1, 64, 64, 3)))
    assert out2["x_norm_patchtokens"].shape == (1, 64, 32)


def test_block_masks_properties():
    masks = sample_block_masks(jax.random.PRNGKey(0), 4, (8, 8), (0.2, 0.8), 3)
    assert masks.shape == (3, 4, 64)
    counts = np.asarray(masks.sum(-1))
    assert (counts > 0).all()
    # same block area for all masks in one call (reference dino.py:274-279)
    assert len(np.unique(counts)) == 1
    m2 = sample_block_masks(jax.random.PRNGKey(1), 4, (8, 8), (0.2, 0.8), 3)
    assert not np.array_equal(np.asarray(masks), np.asarray(m2))


def test_constrained_masks_respect_forbidden_or_fallback():
    key = jax.random.PRNGKey(0)
    forbidden = jnp.zeros((4, 64), bool).at[:, :32].set(True)
    masks = sample_block_masks_constrained(key, 4, (8, 8), (0.3, 0.5), 2, forbidden, min_keep=2)
    counts = np.asarray(masks.sum(-1))
    assert (counts > 0).all()


def test_tube_masks_static_keep():
    masks = random_tube_masks(jax.random.PRNGKey(0), 2, (2, 4, 4), 0.75, 2)
    assert masks.shape == (2, 2, 32)
    counts = np.asarray(masks.sum(-1))
    assert (counts == 2 * 4).all()  # keep 4 of 16 per frame, over 2 frames


def test_dino_loss_math():
    key = jax.random.PRNGKey(0)
    s = jax.random.normal(key, (4, 16))
    state = DINOLossState(jnp.zeros((1, 16)))
    t_probs = softmax_center_teacher(state, s, 0.04)
    np.testing.assert_allclose(np.asarray(t_probs.sum(-1)), 1.0, rtol=1e-5)
    loss = dino_cross_entropy([s], [t_probs], 0.1)
    assert float(loss) > 0
    new_state = update_center(state, s, momentum=0.9)
    np.testing.assert_allclose(np.asarray(new_state.center), np.asarray(0.1 * s.mean(0, keepdims=True)), rtol=1e-5)


def test_sinkhorn_assignment_properties():
    t = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
    q = sinkhorn_knopp_teacher(t, 0.04, n_iterations=3)
    # per-sample assignment sums to 1 (reference dino_loss.py:60-62 "columns must sum to 1")
    np.testing.assert_allclose(np.asarray(q.sum(-1)), 1.0, rtol=1e-4)
    assert (np.asarray(q) >= 0).all()
    # 3 sinkhorn iterations flatten prototype usage vs a raw softmax
    raw = jax.nn.softmax(t / 0.04, axis=-1)
    cv_raw = float(raw.sum(0).std() / raw.sum(0).mean())
    cv_q = float(q.sum(0).std() / q.sum(0).mean())
    assert cv_q < cv_raw


def test_koleo_positive_for_clustered():
    x = jnp.ones((8, 16)) + jax.random.normal(jax.random.PRNGKey(0), (8, 16)) * 1e-3
    assert float(koleo_loss(x)) > 0  # clustered -> high (positive) loss


def test_koleo_grad_finite_with_duplicate_rows():
    """Two identical samples in a batch (common early in training; bf16
    rounding makes exact collisions likely) must not NaN the gradient: the
    reference's KoLeo survives because torch F.pairwise_distance adds eps
    INSIDE the norm (d/dx ||x-y|| is 0/0 at x == y). Regression for the
    round-4 DINOv2 texture run that NaN'd at step 1."""
    x = jnp.array([[1.0, 2.0, 3.0], [1.0, 2.0, 3.0], [0.5, -1.0, 2.0], [3.0, 0.1, 0.2]])
    loss, g = jax.value_and_grad(koleo_loss)(x)
    assert np.isfinite(float(loss))
    assert bool(jnp.isfinite(g).all()), g


def test_dino_head_grad_finite_at_zero_input():
    """The DINOHead's L2-normalize must keep a finite gradient even for an
    exactly-zero bottleneck vector (max(norm, eps) clamps the forward but the
    norm VJP is still 0/0 at zero — sqrt(sum + eps^2) is used instead)."""
    from m3l_tpu.nn.vit_layers import DINOHead

    head = DINOHead(16, 32, hidden_dim=16, bottleneck_dim=8, rngs=nnx.Rngs(0))
    graphdef, params = nnx.split(head, nnx.Param)

    def loss(p, x):
        return nnx.merge(graphdef, p)(x).sum()

    x = jnp.zeros((2, 16))
    g = jax.grad(loss)(params, x)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


def test_mae_module_trains(tmp_path):
    enc = tiny_vit(registers=0)
    mae = MAEModule(enc, decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2, mask_ratio=0.75, rngs=nnx.Rngs(1))
    rng = np.random.default_rng(0)
    batches = [{"image": rng.random((4, 32, 32, 3), dtype=np.float32)} for _ in range(3)]
    trainer = Trainer(max_epochs=2, ckpt_dir=str(tmp_path / "ck"), save_ckpt_every_n_epochs=1, verbose=0)
    hist = trainer.fit(mae, batches)
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["train_loss"])
    assert hist[-1]["train_loss"] < hist[0]["train_loss"] * 1.5
    assert os.path.isdir(tmp_path / "ck" / "last.ckpt")
    assert os.path.isdir(tmp_path / "ck" / "epoch-0002.ckpt")


def test_trainer_resume(tmp_path):
    def make():
        enc = tiny_vit(registers=0)
        return MAEModule(enc, decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2, rngs=nnx.Rngs(1))

    rng = np.random.default_rng(0)
    batches = [{"image": rng.random((4, 32, 32, 3), dtype=np.float32)} for _ in range(2)]
    t1 = Trainer(max_epochs=1, ckpt_dir=str(tmp_path / "ck"), verbose=0)
    t1.fit(make(), batches)
    t2 = Trainer(max_epochs=2, ckpt_dir=str(tmp_path / "ck"), verbose=0)
    m2 = make()
    hist = t2.fit(m2, batches)
    assert t2.current_epoch == 2
    assert len(hist) == 1  # only one additional epoch ran after resume


def test_dino_module_step():
    enc = tiny_vit(registers=1)
    dino = DINOModule(
        enc,
        dino_out_dim=64,
        dino_hidden_dim=32,
        dino_bottleneck_dim=16,
        num_local_masks=2,
        num_global_masks=1,
        moving_average_decay=(0.99, 1.0),
        teacher_temp=(0.04, 0.07),
        with_reconstruction_probe=True,
        rngs=nnx.Rngs(2),
    )
    dino.setup_schedules(steps_per_epoch=2, epochs=2)
    rng = np.random.default_rng(0)
    batches = [{"image": rng.random((4, 32, 32, 3), dtype=np.float32)} for _ in range(2)]
    # teacher must start equal to student
    t0 = nnx.to_pure_dict(nnx.state(dino.teacher_backbone, nnx.Param))
    s0 = nnx.to_pure_dict(nnx.state(dino.student_backbone, nnx.Param))
    for a, b in zip(jax.tree.leaves(t0), jax.tree.leaves(s0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    trainer = Trainer(max_epochs=2, verbose=0)
    hist = trainer.fit(dino, batches)
    assert np.isfinite(hist[-1]["train_loss"])
    # center moved
    assert float(jnp.abs(dino.center[...]).max()) > 0
    # teacher != student now (student moved; teacher EMA lags)
    t1 = nnx.to_pure_dict(nnx.state(dino.teacher_backbone, nnx.Param))
    s1 = nnx.to_pure_dict(nnx.state(dino.student_backbone, nnx.Param))
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max()) for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(s1))]
    assert max(diffs) > 0


def test_predictor_shapes():
    pred = vit_predictor(input_dim=32, patch_size=8, embed_dim=48, depth=1, num_heads=2, img_size=(32, 32), in_chans=3, rngs=nnx.Rngs(0))
    ctx = jnp.ones((2, 6, 32))
    ctx_idx = jnp.tile(jnp.arange(6)[None], (2, 1))
    tgt_idx = jnp.tile(jnp.arange(6, 12)[None], (2, 1))
    out = pred.predict(ctx, ctx_idx, tgt_idx)
    assert out.shape == (2, 6, 32)


def test_deterministic_validation_and_image_logging(tmp_path):
    """Val masks depend only on batch index (epoch-comparable val curves) and
    reconstruction image grids flow to the logger (VERDICT r2 items #3/#1)."""
    import numpy as np
    from flax import nnx

    from m3l_tpu.models.vit import VisionTransformer
    from m3l_tpu.ssl import MAEModule
    from m3l_tpu.train import Trainer

    enc = VisionTransformer(
        img_size=(32, 32), patch_size=8, in_chans=3, embed_dim=32, depth=1, num_heads=2,
        pos_embed_fn="sinusoidal", rngs=nnx.Rngs(0),
    )
    mod = MAEModule(enc, mask_ratio=0.5, decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2, rngs=nnx.Rngs(1))
    rng = np.random.default_rng(0)
    train = [{"image": rng.random((4, 32, 32, 3), dtype=np.float32)}]
    val = [{"image": rng.random((4, 32, 32, 3), dtype=np.float32)}]

    class CaptureLogger:
        def __init__(self):
            self.images = {}
            self.scalars = []

        def log_scalars(self, metrics, step):
            self.scalars.append(metrics)

        def log_image(self, tag, image, step):
            self.images[tag] = np.asarray(image)

    logger = CaptureLogger()
    trainer = Trainer(max_epochs=2, verbose=0, log_images_every_n_epochs=1, logger=logger)
    trainer.fit(mod, train, val)
    assert "reconstruction/original" in logger.images
    assert "reconstruction/masked" in logger.images
    assert "reconstruction/reconstruction" in logger.images
    img = logger.images["reconstruction/original"]
    assert img.ndim == 3 and img.shape[-1] == 3

    # deterministic val key: same module state + same val batch -> identical loss
    import jax

    @nnx.jit
    def vloss(m, batch, key):
        return m.validation_loss(batch, key, 0)[0]

    k = jax.random.fold_in(jax.random.PRNGKey(trainer._val_seed), 0)
    l1 = float(vloss(mod, val[0], k))
    l2 = float(vloss(mod, val[0], k))
    assert l1 == l2


def test_mae_masked_query_decoder_contract():
    # CrossMAE-style masked-only decode: pred is zero at visible positions,
    # nonzero at masked ones, and the masked loss interface is unchanged
    enc = tiny_vit(registers=0)
    mae = MAEModule(
        enc, decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=2,
        mask_ratio=0.75, decode_masked_only=True, rngs=nnx.Rngs(1),
    )
    x = jnp.asarray(np.random.default_rng(0).random((3, 32, 32, 3), dtype=np.float32))
    pred, mask = mae(x, jax.random.PRNGKey(0))
    assert pred.shape == (3, 16, 8 * 8 * 3)
    assert mask.shape == (3, 16)
    vis = np.asarray(mask) == 0
    assert np.all(np.asarray(pred)[vis] == 0)
    assert np.all(np.abs(np.asarray(pred)[~vis]).sum(-1) > 0)
    loss = mae.compute_loss(x, pred, mask)
    assert np.isfinite(float(loss))


def test_mae_masked_query_decoder_trains(tmp_path):
    enc = tiny_vit(registers=0)
    mae = MAEModule(
        enc, decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
        mask_ratio=0.75, decode_masked_only=True, rngs=nnx.Rngs(1),
    )
    rng = np.random.default_rng(0)
    batches = [{"image": rng.random((4, 32, 32, 3), dtype=np.float32)} for _ in range(3)]
    trainer = Trainer(max_epochs=2, ckpt_dir=str(tmp_path / "ck"), save_ckpt_every_n_epochs=1, verbose=0)
    hist = trainer.fit(mae, batches)
    assert np.isfinite(hist[-1]["train_loss"])
    assert hist[-1]["train_loss"] < hist[0]["train_loss"] * 1.5
