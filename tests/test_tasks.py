"""Downstream probes, SLModule harness, TacBench evaluators, datasets."""
import numpy as np
import pytest
from flax import nnx

from m3l_tpu.data import ArrayDataset, DataLoader, VisionTactileDataset
from m3l_tpu.eval import TestForceSL, TestPoseSL, TestSlipSL, classification_metrics
from m3l_tpu.models.vit import VisionTransformer
from m3l_tpu.ssl import MAEModule
from m3l_tpu.tasks import (
    ForceLinearProbe,
    ForceSLModule,
    GraspLinearProbe,
    GraspSLModule,
    PoseLinearProbe,
    PoseSLModule,
    SlipForceProbe,
    SlipProbe,
    SlipSLModule,
    TextileLinearProbe,
    TextileSLModule,
    load_encoder_from_checkpoint,
)
from m3l_tpu.train import Trainer


def tiny_vit(seed=0):
    return VisionTransformer(
        img_size=(32, 32), patch_size=8, in_chans=3, embed_dim=32, depth=1, num_heads=2,
        pos_embed_fn="sinusoidal", num_register_tokens=0, rngs=nnx.Rngs(seed),
    )


def force_batches(n=2, b=8, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "image": rng.random((b, 32, 32, 3), dtype=np.float32),
            "force": rng.normal(size=(b, 3)).astype(np.float32),
            "force_scale": np.full((b, 3), 2.0, np.float32),
        }
        for _ in range(n)
    ]


def test_force_probe_trains_frozen_encoder():
    enc = tiny_vit()
    probe = ForceLinearProbe(32, num_heads=2, rngs=nnx.Rngs(1))
    mod = ForceSLModule(enc, probe, train_encoder=False)
    enc_before = nnx.to_pure_dict(nnx.state(mod.model_encoder, nnx.Param))
    trainer = Trainer(max_epochs=2, verbose=0)
    hist = trainer.fit(mod, force_batches())
    assert np.isfinite(hist[-1]["train_loss"])
    enc_after = nnx.to_pure_dict(nnx.state(mod.model_encoder, nnx.Param))
    import jax

    diffs = [np.abs(np.asarray(a) - np.asarray(b)).max() for a, b in zip(jax.tree.leaves(enc_before), jax.tree.leaves(enc_after))]
    assert max(diffs) == 0.0, "frozen encoder moved"


def test_force_probe_finetune_moves_encoder():
    import jax

    enc = tiny_vit()
    probe = ForceLinearProbe(32, num_heads=2, rngs=nnx.Rngs(1))
    mod = ForceSLModule(enc, probe, train_encoder=True)
    enc_before = nnx.to_pure_dict(nnx.state(mod.model_encoder, nnx.Param))
    Trainer(max_epochs=1, verbose=0).fit(mod, force_batches())
    enc_after = nnx.to_pure_dict(nnx.state(mod.model_encoder, nnx.Param))
    diffs = [np.abs(np.asarray(a) - np.asarray(b)).max() for a, b in zip(jax.tree.leaves(enc_before), jax.tree.leaves(enc_after))]
    assert max(diffs) > 0.0


@pytest.mark.parametrize("module_cls,probe_cls,label", [
    (SlipSLModule, SlipProbe, "slip"),
    (GraspSLModule, GraspLinearProbe, "grasp"),
    (TextileSLModule, TextileLinearProbe, "textile"),
])
def test_classification_probes(module_cls, probe_cls, label):
    rng = np.random.default_rng(0)
    n_classes = 4 if label == "textile" else 2
    enc = tiny_vit()
    probe = probe_cls(32, num_classes=n_classes, num_heads=2, rngs=nnx.Rngs(1))
    mod = module_cls(enc, probe, class_weights=np.ones(n_classes))
    batches = [
        {"image": rng.random((8, 32, 32, 3), dtype=np.float32), label: rng.integers(0, n_classes, 8)}
        for _ in range(2)
    ]
    hist = Trainer(max_epochs=1, verbose=0).fit(mod, batches)
    assert np.isfinite(hist[-1]["train_loss"])


def test_pose_module_and_eval():
    rng = np.random.default_rng(0)
    enc = tiny_vit()
    probe = PoseLinearProbe(32, num_classes=5, num_heads=2, rngs=nnx.Rngs(1))
    mod = PoseSLModule(enc, probe)
    batches = [
        {
            "image": rng.random((8, 32, 32, 3), dtype=np.float32),
            "pose_x": rng.integers(0, 5, 8),
            "pose_y": rng.integers(0, 5, 8),
            "pose_theta": rng.integers(0, 5, 8),
        }
        for _ in range(2)
    ]
    Trainer(max_epochs=1, verbose=0).fit(mod, batches)
    metrics = TestPoseSL(mod).evaluate(batches)
    for head in ("x", "y", "theta"):
        assert 0.0 <= metrics[f"acc_{head}"] <= 1.0


def test_slip_force_probe():
    import jax

    probe = SlipForceProbe(32, num_classes=2, num_heads=2, rngs=nnx.Rngs(0))
    tokens = jax.numpy.ones((4, 16, 32))
    force = jax.numpy.ones((4, 3))
    logits = probe(tokens, force)
    assert logits.shape == (4, 2)


def test_force_eval_metrics():
    rng = np.random.default_rng(0)
    enc = tiny_vit()
    probe = ForceLinearProbe(32, num_heads=2, rngs=nnx.Rngs(1))
    mod = ForceSLModule(enc, probe)
    batches = force_batches(n=2, b=16)
    metrics = TestForceSL(mod).evaluate(batches)
    for axis in "xyz":
        assert np.isfinite(metrics[f"rmse_{axis}"])
        lo, hi = metrics[f"rmse_{axis}_ci95"]
        assert lo <= metrics[f"rmse_{axis}"] * 1.5 and hi >= metrics[f"rmse_{axis}"] * 0.5


def test_encoder_checkpoint_surgery(tmp_path):
    """Train a tiny MAE, checkpoint it, load its encoder into a probe module
    (reference sl_module.py:81-103 key-surgery flow)."""
    import jax

    enc = tiny_vit()
    mae = MAEModule(enc, decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2, rngs=nnx.Rngs(1))
    rng = np.random.default_rng(0)
    batches = [{"image": rng.random((4, 32, 32, 3), dtype=np.float32)}]
    Trainer(max_epochs=1, ckpt_dir=str(tmp_path / "ck"), verbose=0).fit(mae, batches)

    enc2 = tiny_vit(seed=42)  # different init
    load_encoder_from_checkpoint(enc2, str(tmp_path / "ck" / "last.ckpt"), encoder_type="mae")
    trained = nnx.to_pure_dict(nnx.state(mae.encoder, nnx.Param))
    loaded = nnx.to_pure_dict(nnx.state(enc2, nnx.Param))
    for a, b in zip(jax.tree.leaves(trained), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_classification_metrics_math():
    pred = np.array([0, 0, 1, 1, 1])
    gt = np.array([0, 1, 1, 1, 0])
    m = classification_metrics(pred, gt, 2)
    assert m["accuracy"] == pytest.approx(3 / 5)
    assert np.asarray(m["confusion"]).sum() == 5


def test_datasets_and_loader():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (20, 16, 16, 3), dtype=np.uint8)
    labels = {"force": rng.normal(size=(20, 3)).astype(np.float32)}
    ds = VisionTactileDataset(frames, num_frames=2, frame_stride=2, out_format="concat_ch_img", labels=labels)
    assert len(ds) == 18
    item = ds[0]
    assert item["image"].shape == (16, 16, 6)
    np.testing.assert_allclose(item["force"], labels["force"][2])  # anchored to last frame
    vid = VisionTactileDataset(frames, num_frames=2, out_format="video")[0]["image"]
    assert vid.shape == (2, 16, 16, 3)

    loader = DataLoader(ArrayDataset({"x": np.arange(10)}), batch_size=4, drop_last=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2 and batches[0]["x"].shape == (4,)
