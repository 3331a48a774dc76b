"""Evaluation plots (reference tactile_ssl/utils/plotting_forces.py +
force_sl.py:163-185 on_validation_epoch_end): per-axis prediction/GT
correlation scatter and force error histograms/cone. Returns RGB arrays so
loggers can write them without display."""
from __future__ import annotations

import numpy as np


def _fig_to_array(fig) -> np.ndarray:
    import matplotlib

    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    import matplotlib.pyplot as plt

    plt.close(fig)
    return buf


def plot_correlation(gt: np.ndarray, pred: np.ndarray, axis_names=("Fx", "Fy", "Fz")) -> np.ndarray:
    import matplotlib

    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    n = gt.shape[1]
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
    axes = np.atleast_1d(axes)
    for i, ax in enumerate(axes):
        ax.scatter(gt[:, i], pred[:, i], s=4, alpha=0.4)
        lim = [min(gt[:, i].min(), pred[:, i].min()), max(gt[:, i].max(), pred[:, i].max())]
        ax.plot(lim, lim, "k--", lw=1)
        r = np.corrcoef(gt[:, i], pred[:, i])[0, 1] if gt.shape[0] > 1 else np.nan
        ax.set_title(f"{axis_names[i]} (r={r:.3f})")
        ax.set_xlabel("ground truth")
        ax.set_ylabel("prediction")
    fig.tight_layout()
    return _fig_to_array(fig)


def plot_forces_error(gt: np.ndarray, pred: np.ndarray, axis_names=("Fx", "Fy", "Fz")) -> tuple[np.ndarray, np.ndarray]:
    import matplotlib

    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    err = pred - gt
    fig, axes = plt.subplots(1, err.shape[1], figsize=(4 * err.shape[1], 3))
    axes = np.atleast_1d(axes)
    for i, ax in enumerate(axes):
        ax.hist(err[:, i], bins=40)
        ax.set_title(f"{axis_names[i]} err (RMSE {np.sqrt((err[:, i] ** 2).mean()):.3f})")
    fig.tight_layout()
    img_err = _fig_to_array(fig)

    # shear error "cone": error magnitude vs normal-force magnitude
    fig2, ax = plt.subplots(figsize=(4, 4))
    mag = np.linalg.norm(gt, axis=1)
    emag = np.linalg.norm(err, axis=1)
    ax.scatter(mag, emag, s=4, alpha=0.4)
    ax.set_xlabel("|force| (gt)")
    ax.set_ylabel("|error|")
    fig2.tight_layout()
    img_cone = _fig_to_array(fig2)
    return img_err, img_cone
