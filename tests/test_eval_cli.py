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


def test_smooth_slip_predictions():
    from m3l_tpu.eval import smooth_slip_predictions

    # only runs of >= window consecutive slips survive
    raw = np.array([0, 1, 0, 1, 1, 1, 1, 0, 1, 1])
    out = smooth_slip_predictions(raw, window=3)
    np.testing.assert_array_equal(out, [0, 0, 0, 0, 0, 1, 1, 0, 0, 0])


def test_slip_evaluator_delta_force_and_threshold():
    """SlipForceProbe-style dict predictions: threshold decisions,
    per-trajectory smoothing, delta-force metrics (reference
    test_t2_slip.py:44-163)."""
    from m3l_tpu.eval import TestSlipSL

    rng = np.random.default_rng(0)
    n = 60
    labels = (rng.random(n) > 0.6).astype(int)
    # confident logits matching labels -> smoothed accuracy high on long runs
    logits = np.stack([1.0 - labels * 2.0, labels * 2.0 - 1.0], axis=1) * 3
    delta_gt = rng.normal(size=(n, 3)).astype(np.float32)
    delta_pred = delta_gt + rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    results = {
        "pred": {"slip": logits, "force": delta_pred},
        "slip_label": labels,
        "delta_force": delta_gt,
        "delta_force_scale": np.tile([2.0, 2.0, 2.0], (n, 1)),
        "traj_id": np.repeat([0, 1, 2], n // 3),
    }
    ev = TestSlipSL.__new__(TestSlipSL)  # metrics only, no module needed
    m = ev.get_overall_metrics(results)
    assert m["n_samples"] == n
    assert len(m["delta_force/rmse"]) == 3
    assert all(c > 0.9 for c in m["delta_force/corr"])
    # rmse is in Newton scale (x2)
    assert m["delta_force/rmse"][0] < 0.5

    plots = ev.make_plots({**results, "force": delta_gt, "force_scale": np.tile([1.0, 1.0, 1.0], (n, 1))})
    assert any(k.startswith("slip_traj") for k in plots)
    assert any(k.startswith("delta_forces_traj") for k in plots)
    for img in plots.values():
        assert img.ndim == 3 and img.shape[-1] == 3


def test_grasp_textile_pose_plots():
    from m3l_tpu.eval import TestGraspSL, TestPoseSL, TestTextileSL

    rng = np.random.default_rng(0)
    n = 40
    labels = rng.integers(0, 2, n)
    logits = np.eye(2)[labels] * 2 + rng.normal(size=(n, 2)) * 0.1
    ev = TestGraspSL.__new__(TestGraspSL)
    plots = ev.make_plots({"pred": logits, "grasp": labels})
    assert "confusion_matrix" in plots and plots["confusion_matrix"].ndim == 3

    ev = TestTextileSL.__new__(TestTextileSL)
    labels20 = rng.integers(0, 5, n)
    logits20 = np.eye(5)[labels20] * 2
    plots = ev.make_plots({"pred": logits20, "textile": labels20})
    assert plots["confusion_matrix"].ndim == 3

    ev = TestPoseSL.__new__(TestPoseSL)
    res = {"pred": {}}
    for head in ("x", "y", "theta"):
        lab = rng.integers(0, 4, n)
        res["pred"][head] = np.eye(4)[lab] * 2
        res[f"pose_{head}"] = lab
    plots = ev.make_plots(res)
    assert set(plots) == {"confusion_x", "confusion_y", "confusion_theta"}
