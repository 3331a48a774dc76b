"""Per-task dataset wrappers (reference tactile_ssl/data parity).

The reference ships one dataset class per (sensor, task) pair
(vision_based_{force,slip,pose,grasp,textile}_probes.py, digit_slip.py,
digit_ycbslide.py, gelsight_grasp.py) — all pickled in-memory buffers of
frames plus per-frame labels. Here one generic factory covers them: a
:class:`VisionTactileDataset` window over the sensor frames joined with the
task's label arrays, per-task label-key normalization, and the reference's
per-task binning conventions (pose x/y/theta bins, slip binarization).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .datasets import VisionTactileDataset, load_pickle_dataset

LABEL_KEYS = {
    "force": ("force",),
    "slip": ("slip",),
    "pose": ("pose_x", "pose_y", "pose_theta"),
    "grasp": ("grasp",),
    "textile": ("textile",),
}


def bin_labels(values: np.ndarray, num_bins: int, lo: Optional[float] = None, hi: Optional[float] = None) -> np.ndarray:
    """Continuous -> class bins (reference pose_sl.py binning convention)."""
    lo = float(values.min()) if lo is None else lo
    hi = float(values.max()) if hi is None else hi
    scaled = (values - lo) / max(hi - lo, 1e-8)
    return np.clip((scaled * num_bins).astype(np.int64), 0, num_bins - 1)


def make_task_dataset(
    path_or_buffer,
    task: str,
    *,
    num_frames: int = 2,
    frame_stride: int = 1,
    out_format: str = "concat_ch_img",
    remove_background: bool = False,
    pose_bins: int = 10,
    force_scale: Optional[np.ndarray] = None,
) -> VisionTactileDataset:
    buf = load_pickle_dataset(path_or_buffer) if isinstance(path_or_buffer, str) else dict(path_or_buffer)
    frames = np.asarray(buf.pop("frames") if "frames" in buf else buf.pop("image"))
    labels: dict = {}
    if task == "force":
        f = np.asarray(buf["force"], np.float32)
        scale = np.asarray(force_scale, np.float32) if force_scale is not None else np.abs(f).max(axis=0, keepdims=True) + 1e-8
        labels["force"] = (f / scale).astype(np.float32)
        labels["force_scale"] = np.broadcast_to(scale, f.shape).astype(np.float32)
    elif task == "slip":
        labels["slip"] = np.asarray(buf["slip"]).astype(np.int64).reshape(-1)
        if "force" in buf:
            labels["force"] = np.asarray(buf["force"], np.float32)
    elif task == "pose":
        pose = np.asarray(buf["pose"], np.float32)  # (T, 3): x, y, theta
        for i, key in enumerate(("pose_x", "pose_y", "pose_theta")):
            labels[key] = bin_labels(pose[:, i], pose_bins)
    elif task == "grasp":
        labels["grasp"] = np.asarray(buf["grasp"]).astype(np.int64).reshape(-1)
    elif task == "textile":
        labels["textile"] = np.asarray(buf["textile"]).astype(np.int64).reshape(-1)
    else:
        raise ValueError(f"unknown task {task!r}")
    return VisionTactileDataset(
        frames,
        num_frames=num_frames,
        frame_stride=frame_stride,
        out_format=out_format,
        remove_background=remove_background,
        labels=labels,
    )
