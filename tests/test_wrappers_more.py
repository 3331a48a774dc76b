"""Coverage for wrappers, reconstruct viz paths, loggers, slip-force module."""
import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

import gymnasium as gym
from gymnasium.spaces import Box, Dict as DictSpace


class _TinyDictEnv(gym.Env):
    def __init__(self):
        self.observation_space = DictSpace({"image": Box(0, 255, (16, 16, 3), np.uint8)})
        self.action_space = Box(-1, 1, (2,), np.float32)
        self._t = 0

    def reset(self, *, seed=None, options=None):
        self._t = 0
        return {"image": np.full((16, 16, 3), 10, np.uint8)}, {}

    def step(self, a):
        self._t += 1
        return {"image": np.full((16, 16, 3), 10 + self._t, np.uint8)}, 1.0, False, self._t >= 5, {}


def test_framestack_reset_fills_and_rolls():
    from m3l_tpu.envs import FrameStack

    env = FrameStack(_TinyDictEnv(), 3)
    obs, _ = env.reset()
    assert obs["image"].shape == (3, 16, 16, 3)
    assert (obs["image"][0] == obs["image"][2]).all()  # filled with initial obs
    obs, *_ = env.step(np.zeros(2))
    assert obs["image"][2, 0, 0, 0] == 11 and obs["image"][1, 0, 0, 0] == 10


def test_resize_dict_uint8_and_float():
    from m3l_tpu.envs import ResizeDict

    env = ResizeDict(_TinyDictEnv(), 8)
    obs, _ = env.reset()
    assert obs["image"].shape == (8, 8, 3) and obs["image"].dtype == np.uint8
    envf = ResizeDict(_TinyDictEnv(), 8, to_float=True)
    obs, _ = envf.reset()
    assert obs["image"].dtype == np.float32 and obs["image"].max() <= 1.0


def test_reconstruct_early_conv_path():
    from m3l_tpu.models import VTT, VTTConfig, VTMAE

    rngs = nnx.Rngs(0)
    cfg = VTTConfig(dim=32, depth=1, heads=2, mlp_dim=64)
    mae = VTMAE(VTT(cfg, rngs=rngs), decoder_dim=32, masking_ratio=0.5, decoder_depth=1, decoder_heads=2, early_conv_masking=True, rngs=rngs)
    rng = np.random.default_rng(0)
    x = {
        "image": jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32)),
        "tactile1": jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32)),
        "tactile2": jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32)),
    }
    out = mae.reconstruct(x, jax.random.PRNGKey(0))
    assert out["image_rec"].shape == (2, 64, 64, 3)
    assert np.isfinite(float(out["recon_loss_image"]))


def test_learned_posenc_decoder_path():
    """use_sincosmod_encodings=False: learned pos-emb + decoder Embed path."""
    from m3l_tpu.models import VTT, VTTConfig, VTMAE

    rngs = nnx.Rngs(0)
    cfg = VTTConfig(dim=32, depth=1, heads=2, mlp_dim=64)
    mae = VTMAE(VTT(cfg, rngs=rngs), decoder_dim=32, masking_ratio=0.75, decoder_depth=1, decoder_heads=2,
                early_conv_masking=False, use_sincosmod_encodings=False, rngs=rngs)
    rng = np.random.default_rng(0)
    x = {
        "image": jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32)),
        "tactile1": jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32)),
        "tactile2": jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32)),
    }
    loss = mae(x, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # decoder positional table must receive gradient in this mode
    gd, state = nnx.split(mae)
    grads = jax.grad(lambda s: nnx.merge(gd, s)(x, jax.random.PRNGKey(0)))(state)
    flat = {"/".join(map(str, p)): v for p, v in nnx.to_flat_state(grads)}
    g = [np.abs(np.asarray(v.get_value() if hasattr(v, 'get_value') else v)).max() for k, v in flat.items() if "decoder_pos_emb" in k]
    assert g and max(g) > 0


def test_slip_force_module_end_to_end():
    from m3l_tpu.models.vit import VisionTransformer
    from m3l_tpu.tasks import SlipForceProbe, SlipSLModule
    from m3l_tpu.train import Trainer

    enc = VisionTransformer(img_size=(32, 32), patch_size=8, in_chans=3, embed_dim=32, depth=1, num_heads=2, pos_embed_fn="sinusoidal", rngs=nnx.Rngs(0))
    probe = SlipForceProbe(32, num_classes=2, num_heads=2, rngs=nnx.Rngs(1))
    mod = SlipSLModule(enc, probe, use_force=True)
    rng = np.random.default_rng(0)
    batches = [{
        "image": rng.random((8, 32, 32, 3), dtype=np.float32),
        "force": rng.normal(size=(8, 3)).astype(np.float32),
        "slip": rng.integers(0, 2, 8),
    } for _ in range(2)]
    hist = Trainer(max_epochs=1, verbose=0).fit(mod, batches)
    assert np.isfinite(hist[-1]["train_loss"])


def test_wandb_logger_noop_without_wandb():
    from m3l_tpu.utils.loggers import WandbLogger

    lg = WandbLogger(project="x")
    assert not lg.active
    lg.log_scalars({"a": 1.0}, 0)  # must not raise
