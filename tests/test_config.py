"""Config system: composition, interpolation, overrides, instantiation,
and the config-driven pretrain CLI."""
import numpy as np
import pytest

from m3l_tpu.utils.config import instantiate, load_config

CONFIG_ROOT = "config"


def test_default_composition():
    cfg = load_config(f"{CONFIG_ROOT}/default.yaml")
    assert cfg["model"]["encoder"]["_target_"].endswith("build_vit")
    assert cfg["data"]["dataset_type"] == "vision_tactile"
    assert cfg["trainer"]["max_epochs"] == 200
    # interpolation: ckpt_dir uses model_size
    assert "small" in cfg["ckpt_dir"]


def test_override_propagates_through_interpolation():
    cfg = load_config(f"{CONFIG_ROOT}/default.yaml", ["model_size=base", "trainer.max_epochs=3"])
    assert cfg["trainer"]["max_epochs"] == 3
    assert "base" in cfg["ckpt_dir"]
    assert cfg["model"]["encoder"]["size"] == "base"


def test_experiment_group_replacement():
    cfg = load_config(f"{CONFIG_ROOT}/experiment/dino_vit.yaml")
    assert cfg["model"]["algorithm"]["_target_"].endswith("build_dino")
    # group replacement must not leak mae keys into the dino algorithm
    assert "mask_ratio" not in cfg["model"]["algorithm"]
    assert cfg["model"]["encoder"]["num_register_tokens"] == 1


@pytest.mark.parametrize("experiment", ["mae_vit", "dino_vit", "dinov2_vit", "ijepa_vit", "vjepa_vit"])
def test_all_experiments_instantiate(experiment):
    cfg = load_config(
        f"{CONFIG_ROOT}/experiment/{experiment}.yaml",
        ["model.encoder.img_size=[32,32]", "model.encoder.patch_size=8", "model.encoder.depth=1", "trainer.max_epochs=1", "trainer.ckpt_dir=null"],
    )
    encoder = instantiate(cfg["model"]["encoder"])
    algorithm = instantiate(cfg["model"]["algorithm"])(encoder)
    assert hasattr(algorithm, "training_loss")


def test_pretrain_cli_smoke(tmp_path):
    from m3l_tpu.cli.pretrain import main

    trainer, algorithm, history = main(
        [
            "--config", f"{CONFIG_ROOT}/experiment/mae_vit.yaml",
            "--synthetic", "12",
            "model.encoder.img_size=[32,32]",
            "model.encoder.patch_size=8",
            "model.encoder.depth=1",
            "model.encoder.in_chans=6",
            "model.algorithm.decoder_depth=1",
            "model.algorithm.decoder_embed_dim=32",
            "model.algorithm.decoder_num_heads=2",
            "trainer.max_epochs=1",
            f"trainer.ckpt_dir={tmp_path}/out",
            "trainer.log_every_n_steps=1000",
            "data.batch_size=4",
        ]
    )
    assert len(history) == 1 and np.isfinite(history[0]["train_loss"])
    import os

    assert os.path.isdir(tmp_path / "out" / "last.ckpt")
