"""Live force-field demo CLI (reference tactile_ssl/test/demo_t1_forcefield.py
+ data/vision_based_interactive.py DemoForceFieldData): headless sources,
background-capture convention, and trained-module checkpoint restore."""
import os
from types import SimpleNamespace

import numpy as np
import pytest


def test_demo_dataset_source_untrained(tmp_path):
    """--source dataset replays the training renderer; untrained decoder path
    writes an annotated video (the reference's cv2 overlay loop)."""
    from m3l_tpu.cli.demo_forcefield import main

    out = str(tmp_path / "demo.mp4")
    n = main(["--source", "dataset", "--frames", "3", "--out", out])
    assert n == 3
    assert os.path.getsize(out) > 0


def test_demo_trained_module_restore_roundtrip(tmp_path):
    """--module_ckpt restores a Trainer full-state checkpoint into the
    rebuilt GeometricForceFieldModule structure (key/shape-exact via
    replace_by_pure_dict) and runs forward_fields per frame."""
    from flax import nnx

    from m3l_tpu.cli.demo_forcefield import _build_module_structure, main
    from m3l_tpu.train.checkpoint import save_checkpoint

    args = SimpleNamespace(dim=32, depth=2, heads=2, hooks="1", fusion_ch=16, dtype="float32")
    module = _build_module_structure(args, 96)
    ckpt = str(tmp_path / "last.ckpt")
    save_checkpoint(ckpt, {"model": nnx.state(module)})

    out = str(tmp_path / "demo_trained.mp4")
    n = main(
        ["--module_ckpt", ckpt, "--dim", "32", "--depth", "2", "--heads", "2",
         "--hooks", "1", "--fusion_ch", "16", "--dtype", "float32",
         "--source", "dataset", "--frames", "2", "--out", out]
    )
    assert n == 2
    assert os.path.getsize(out) > 0


def test_dataset_source_background_tracks_trajectory():
    """The clean-gel background must follow the CURRENT trajectory (the
    reference captures one bg per sensor session; the dataset source swaps
    per-trajectory)."""
    from m3l_tpu.cli.demo_forcefield import _DatasetSource

    src = _DatasetSource(48)
    first_traj_len = int((src.tid == 0).sum())
    src.read()
    bg0 = src.background()
    for _ in range(first_traj_len):
        src.read()
    bg1 = src.background()
    assert not np.array_equal(bg0, bg1)
