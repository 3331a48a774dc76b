"""Downstream probe training + TacBench evaluation CLI (config-driven).

Completes the reference's task flow (config/task/*.yaml ``test:`` blocks,
SURVEY.md §3.4): train a probe over a (frozen) encoder, then run the task's
TacBench evaluator and print metrics as JSON.

Usage:
    python -m m3l_tpu.cli.evaluate --config config/default.yaml \
        --task force --data buffer.pkl \
        task.checkpoint_encoder=outputs/small/last.ckpt task.encoder_type=mae
"""
from __future__ import annotations

import argparse
import json

import numpy as np

from ..utils.config import instantiate, load_config

_EVALUATORS = {
    "force": "TestForceSL",
    "slip": "TestSlipSL",
    "pose": "TestPoseSL",
    "grasp": "TestGraspSL",
    "textile": "TestTextileSL",
}


def synthetic_task_buffer(task: str, n: int, size: int, rng):
    buf = {"frames": rng.integers(0, 255, (n, size, size, 3), dtype=np.uint8)}
    if task == "force":
        buf["force"] = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    elif task == "slip":
        buf["slip"] = rng.integers(0, 2, n)
    elif task == "pose":
        buf["pose"] = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    elif task == "grasp":
        buf["grasp"] = rng.integers(0, 2, n)
    elif task == "textile":
        buf["textile"] = rng.integers(0, 20, n)
    return buf


def main(argv=None):
    import m3l_tpu.eval as tacbench
    from ..data import DataLoader
    from ..data.task_datasets import make_task_dataset

    parser = argparse.ArgumentParser("m3l-tpu evaluate")
    parser.add_argument("--config", type=str, default="config/default.yaml")
    parser.add_argument("--task", type=str, required=True, choices=sorted(_EVALUATORS))
    parser.add_argument("--data", type=str, default=None, help="pickled task buffer; synthetic if omitted")
    parser.add_argument("--synthetic", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    cfg = load_config(args.config, args.overrides)
    encoder = instantiate(cfg["model"]["encoder"])

    task_cfg = dict(cfg.get("task", {}))
    task_cfg.pop("_target_", None)
    task_cfg.pop("_partial_", None)
    task_cfg.pop("task", None)
    from ..train.builders import build_task_module

    module = build_task_module(encoder, args.task, **{k: v for k, v in task_cfg.items() if k in ("checkpoint_encoder", "encoder_type", "train_encoder", "num_classes")})

    data_cfg = cfg.get("data", {})
    size = cfg["model"]["encoder"].get("img_size", [224, 224])[0]
    source = args.data or synthetic_task_buffer(args.task, args.synthetic, size, np.random.default_rng(0))
    ds = make_task_dataset(
        source,
        args.task,
        num_frames=data_cfg.get("num_frames", 2),
        frame_stride=data_cfg.get("frame_stride", 1),
        out_format=data_cfg.get("out_format", "concat_ch_img"),
    )
    loader = DataLoader(ds, batch_size=min(data_cfg.get("batch_size", 64), max(len(ds) // 2, 1)))

    trainer = instantiate(cfg["trainer"])
    trainer.max_epochs = args.epochs
    trainer.fit(module, loader)

    evaluator = getattr(tacbench, _EVALUATORS[args.task])(module, batch_keys=("image", "force") if getattr(module, "use_force", False) else ("image",))
    metrics = evaluator.evaluate(loader)
    print(json.dumps({k: v for k, v in metrics.items() if not isinstance(v, list)}, default=str))
    return metrics


if __name__ == "__main__":
    main()
