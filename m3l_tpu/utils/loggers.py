"""Metric loggers: TensorBoard (tf.summary) + optional wandb adapter.

Capability parity with the reference's logging layer: SB3-Logger->TensorBoard
(reference train.py:175), WandbLogger adapter (utils/wandb_logger.py:9-50,
gated — wandb is optional), and a rank-zero stdout logger
(tactile_ssl/utils/logging.py:19-38).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


class TensorBoardLogger:
    """Event-file writer backed by torch.utils.tensorboard (pure-Python
    protobuf serialization). The previous tf.summary backend loaded the full
    libtensorflow runtime, which segfaults when sharing a process with the
    TPU client + forked env workers (observed twice in dmesg); the torch
    writer produces identical event files without native TF code."""

    def __init__(self, log_dir: str):
        # Force tensorboard's pure-python TF stub even though full TF is
        # installed: registering `tensorboard.compat.notf` before the lazy
        # `tensorboard.compat.tf` resolves makes it skip `import tensorflow`.
        import sys
        import types

        sys.modules.setdefault("tensorboard.compat.notf", types.ModuleType("tensorboard.compat.notf"))
        from torch.utils.tensorboard import SummaryWriter

        os.makedirs(log_dir, exist_ok=True)
        self.writer = SummaryWriter(log_dir)

    def log_scalars(self, metrics: dict, step: int) -> None:
        for k, v in metrics.items():
            if isinstance(v, (int, float, np.floating, np.integer)) and np.isfinite(v):
                self.writer.add_scalar(k, float(v), global_step=step)
        self.writer.flush()

    def log_image(self, tag: str, image: np.ndarray, step: int) -> None:
        img = image[0] if image.ndim == 4 else image  # (H, W, C)
        if img.dtype != np.uint8:
            img = (np.clip(np.asarray(img, np.float32), 0.0, 1.0) * 255).astype(np.uint8)
        self.writer.add_image(tag, img, global_step=step, dataformats="HWC")
        self.writer.flush()


class WandbLogger:
    """Interval-gated wandb adapter (reference utils/wandb_logger.py:9-50).
    No-ops cleanly when wandb is unavailable (zero-egress environments)."""

    def __init__(self, project: Optional[str] = None, entity: Optional[str] = None, run_id: Optional[str] = None, config: Optional[dict] = None, log_interval: int = 1):
        self.log_interval = log_interval
        self._last_step = -1
        try:
            import wandb

            self.wandb = wandb
            self.run = wandb.init(project=project, entity=entity, id=run_id, config=config, resume="allow")
        except Exception:
            self.wandb = None
            self.run = None

    @property
    def active(self) -> bool:
        return self.run is not None

    def log_scalars(self, metrics: dict, step: int) -> None:
        if not self.active or (step - self._last_step) < self.log_interval:
            return
        self._last_step = step
        self.run.log({**metrics, "global_step": step})

    def log_video(self, tag: str, path: str, step: int) -> None:
        if self.active:
            self.run.log({tag: self.wandb.Video(path), "global_step": step})


class MultiLogger:
    def __init__(self, *loggers):
        self.loggers = [lg for lg in loggers if lg is not None]

    def log_scalars(self, metrics: dict, step: int) -> None:
        for lg in self.loggers:
            lg.log_scalars(metrics, step)
