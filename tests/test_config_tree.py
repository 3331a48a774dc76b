"""Downstream experiment config tree: every (task x sensor x algorithm)
combo composes and instantiates (reference
config/experiment/downstream_task/ ~45 combo files + config/paths/ +
config/wandb/)."""
import glob
import os

import numpy as np
import pytest

from m3l_tpu.utils.config import instantiate, load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COMBOS = sorted(glob.glob(os.path.join(REPO, "config/experiment/downstream_task/*/*.yaml")))
TINY = [
    "model.encoder.img_size=[32,32]",
    "model.encoder.patch_size=8",
    "model.encoder.depth=2",
    "model.encoder.in_chans=6",
    "model_size=tiny",
]


def test_combo_tree_complete():
    # exactly the reference's on-disk combo set
    assert len(COMBOS) == 45
    by_task = {}
    for p in COMBOS:
        by_task.setdefault(os.path.basename(os.path.dirname(p)), []).append(os.path.basename(p))
    assert len(by_task["force"]) == 12 and len(by_task["slip"]) == 12
    assert len(by_task["pose"]) == 6 and len(by_task["grasp"]) == 6 and len(by_task["textile"]) == 6
    assert sorted(by_task["forcefield"]) == ["digit_dino.yaml", "digit_e2e.yaml", "gelsight_dino.yaml"]


@pytest.mark.parametrize("path", COMBOS, ids=[os.path.relpath(p, REPO) for p in COMBOS])
def test_combo_composes(path):
    cfg = load_config(path, overrides=TINY)
    # composed structure: paths + wandb groups, task block, data block
    assert cfg["paths"]["encoder_checkpoint_root"]
    assert cfg["wandb"]["project"] == "m3l_tpu"
    assert "_target_" in cfg["task"]
    assert cfg["data"]["batch_size"] > 0
    # interpolations resolved
    sensor, alg = os.path.basename(path)[:-5].split("_", 1)
    assert cfg["sensor"] == sensor and cfg["ssl_name"] == alg
    assert cfg["experiment_name"] == f"{sensor}_{cfg['task_name']}_{alg}_vittiny"
    assert alg in cfg["ckpt_dir"]
    # e2e finetunes, everything else freezes
    assert cfg["task"]["train_encoder"] == (alg == "e2e")


@pytest.mark.parametrize(
    "path",
    [
        "config/experiment/downstream_task/force/digit_mae.yaml",
        "config/experiment/downstream_task/slip/gelsight_dinov2.yaml",
        "config/experiment/downstream_task/pose/digit_ijepa.yaml",
        "config/experiment/downstream_task/grasp/gelsight_e2e.yaml",
        "config/experiment/downstream_task/textile/gelsight_vjepa.yaml",
        "config/experiment/downstream_task/forcefield/digit_dino.yaml",
    ],
)
def test_combo_instantiates_and_steps(path):
    """One combo per task family: build encoder + task module from the
    composed config and run one training_loss step."""
    import jax
    import jax.numpy as jnp

    cfg = load_config(os.path.join(REPO, path), overrides=TINY + ["model.encoder.num_register_tokens=0"])
    encoder = instantiate(cfg["model"]["encoder"])
    task_fn = instantiate(cfg["task"])
    module = task_fn(encoder)

    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.random((2, 32, 32, 6), np.float32))}
    task = cfg["task"].get("task", "forcefield")
    if task == "force":
        batch["force"] = jnp.asarray(rng.random((2, 3), np.float32))
    elif task == "slip":
        batch["slip"] = jnp.asarray(rng.integers(0, 2, 2))
    elif task == "pose":
        for k in ("pose_x", "pose_y", "pose_theta"):
            batch[k] = jnp.asarray(rng.integers(0, 9, 2))
    elif task == "grasp":
        batch["grasp"] = jnp.asarray(rng.integers(0, 2, 2))
    elif task == "textile":
        batch["textile"] = jnp.asarray(rng.integers(0, 20, 2))
    else:  # forcefield SSL needs the bg view
        batch["image_bg"] = batch["image"]
    loss, aux = module.training_loss(batch, jax.random.PRNGKey(0), jnp.asarray(0))
    assert np.isfinite(float(loss)), (path, aux.keys())


def test_paths_and_wandb_groups():
    cfg = load_config(os.path.join(REPO, "config/experiment/downstream_task/force/digit_e2e.yaml"), overrides=["paths.log_dir=/tmp/logs"])
    # wandb save_dir interpolates through the paths group
    assert cfg["wandb"]["save_dir"] == "/tmp/logs"
    tpu = load_config(os.path.join(REPO, "config/paths/tpu_pod.yaml"))
    assert tpu["data_root"].startswith("/mnt/")
