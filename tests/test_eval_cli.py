"""evaluate CLI, task datasets, plots."""
import json
import numpy as np
import pytest


def test_make_task_dataset_variants():
    from m3l_tpu.data import make_task_dataset

    rng = np.random.default_rng(0)
    n = 12
    for task, key in [("force", "force"), ("slip", "slip"), ("grasp", "grasp"), ("textile", "textile")]:
        buf = {"frames": rng.integers(0, 255, (n, 16, 16, 3), dtype=np.uint8)}
        if task == "force":
            buf["force"] = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        elif task == "textile":
            buf[task] = rng.integers(0, 20, n)
        else:
            buf[task] = rng.integers(0, 2, n)
        ds = make_task_dataset(buf, task, num_frames=2)
        item = ds[0]
        assert key in item and "image" in item
        if task == "force":
            assert np.abs(item["force"]).max() <= 1.0 + 1e-6  # normalized by scale
    # pose binning
    buf = {"frames": rng.integers(0, 255, (n, 16, 16, 3), dtype=np.uint8), "pose": rng.uniform(-1, 1, (n, 3)).astype(np.float32)}
    ds = make_task_dataset(buf, "pose", pose_bins=5)
    item = ds[0]
    for k in ("pose_x", "pose_y", "pose_theta"):
        assert 0 <= item[k] < 5


@pytest.mark.parametrize("task", ["force", "slip"])
def test_evaluate_cli(task, tmp_path):
    from m3l_tpu.cli.evaluate import main

    metrics = main(
        [
            "--config", "config/default.yaml",
            "--task", task,
            "--synthetic", "16",
            "--epochs", "1",
            "model.encoder.img_size=[32,32]",
            "model.encoder.patch_size=8",
            "model.encoder.depth=1",
            "model.encoder.in_chans=6",
            f"trainer.ckpt_dir={tmp_path}/out",
            "trainer.log_every_n_steps=1000",
            "data.batch_size=4",
        ]
    )
    if task == "force":
        assert np.isfinite(metrics["rmse"])
    else:
        assert 0.0 <= metrics["accuracy"] <= 1.0


def test_plots_return_images():
    from m3l_tpu.eval import plot_correlation, plot_forces_error

    rng = np.random.default_rng(0)
    gt = rng.normal(size=(50, 3)).astype(np.float32)
    pred = gt + rng.normal(size=(50, 3)).astype(np.float32) * 0.1
    img = plot_correlation(gt, pred)
    assert img.ndim == 3 and img.shape[-1] == 3
    e, c = plot_forces_error(gt, pred)
    assert e.ndim == 3 and c.ndim == 3
