"""Log-spaced probe-only task checkpoints (reference trainer.py:149-154,588-593)."""
import os

import numpy as np
from flax import nnx

from m3l_tpu.models.vit import VisionTransformer
from m3l_tpu.ssl import MAEModule
from m3l_tpu.train import Trainer, load_checkpoint


def test_task_checkpoints_logspaced_and_probe_only(tmp_path):
    enc = VisionTransformer(img_size=(32, 32), patch_size=8, in_chans=3, embed_dim=32, depth=1, num_heads=2, pos_embed_fn="sinusoidal", rngs=nnx.Rngs(0))
    mae = MAEModule(enc, decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2, rngs=nnx.Rngs(1))
    rng = np.random.default_rng(0)
    batches = [{"image": rng.random((4, 32, 32, 3), dtype=np.float32)}]
    tr = Trainer(max_epochs=4, ckpt_dir=str(tmp_path / "ck"), num_task_checkpoints=3, save_ckpt_every_n_epochs=100, verbose=0)
    assert tr.task_ckpt_epochs  # geomspace(1, 4, 3)
    tr.fit(mae, batches)
    files = os.listdir(tmp_path / "ck")
    task_files = [f for f in files if f.startswith("task-")]
    assert task_files, files
    payload = load_checkpoint(str(tmp_path / "ck" / task_files[0]))
    assert "opt" not in payload  # probe-only: no optimizer state
    # full last.ckpt still has optimizer state
    last = load_checkpoint(str(tmp_path / "ck" / "last.ckpt"))
    assert "opt" in last
