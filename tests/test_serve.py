"""Round-trip tests for the serving/export module (m3l_tpu/serve.py).

A trained policy/encoder must export to a self-contained StableHLO
artifact, reload in a process with no model classes, and reproduce the
in-process numerics (bitwise on TPU where both paths run the same
compiled program; within XLA fusion rounding ~4e-7 for eager-vs-exported
on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from m3l_tpu import serve
from m3l_tpu.models import VTT, VTMAE, VTTConfig
from m3l_tpu.rl import ActorCritic, MAEFeatures


def build_policy(frame_stack=1, action_dim=3):
    rngs = nnx.Rngs(0)
    cfg = VTTConfig(dim=64, depth=2, heads=2, mlp_dim=128, num_tactiles=2, frame_stack=frame_stack)
    mae = VTMAE(
        VTT(cfg, rngs=rngs),
        decoder_dim=64,
        masking_ratio=0.95,
        decoder_depth=2,
        decoder_heads=2,
        early_conv_masking=True,
        rngs=rngs,
    )
    feats = MAEFeatures(mae, cfg.dim, frame_stack=frame_stack, rngs=rngs)
    return ActorCritic(feats, cfg.dim, action_dim, rngs=rngs)


def raw_obs(batch=2, frame_stack=1, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.integers(0, 256, (batch, frame_stack, 64, 64, 3), dtype=np.uint8),
        "tactile": rng.uniform(-1, 1, (batch, frame_stack, 6, 32, 32)).astype(np.float32),
    }


def test_policy_roundtrip_deterministic(tmp_path):
    policy = build_policy()
    obs = raw_obs()
    data = serve.export_policy(policy, obs, action_low=[-1, -1, -1], action_high=[1, 1, 1])
    path = str(tmp_path / "policy.shlo")
    serve.save_artifact(path, data)

    exported = serve.load_artifact(path)
    served = np.asarray(exported.call(obs))

    mean, _, _ = policy._dist_params(obs)
    direct = np.clip(np.asarray(mean), -1.0, 1.0)
    # eager-vs-exported differ by XLA fusion rounding (~4e-7 on CPU)
    np.testing.assert_allclose(served, direct, rtol=1e-5, atol=1e-5)
    assert served.shape == (2, 3)
    assert np.all(served >= -1.0) and np.all(served <= 1.0)


def test_policy_roundtrip_stochastic():
    policy = build_policy()
    obs = raw_obs(seed=1)
    key = jax.random.PRNGKey(7)
    data = serve.export_policy(policy, obs, deterministic=False)
    # in-memory deserialize (no disk) is also supported via jax.export
    from jax import export as jexport

    served = np.asarray(jexport.deserialize(data).call(obs, key))
    direct, _, _ = policy.step(obs, key)
    np.testing.assert_allclose(served, np.asarray(direct), rtol=1e-5, atol=1e-5)


def test_encoder_roundtrip(tmp_path):
    policy = build_policy()
    obs = raw_obs(seed=2)
    data = serve.export_encoder(policy.features, obs)
    path = str(tmp_path / "encoder.shlo")
    serve.save_artifact(path, data)
    served = np.asarray(serve.load_artifact(path).call(obs))
    direct = np.asarray(policy.features(obs))
    np.testing.assert_allclose(served, direct, rtol=1e-5, atol=1e-5)
    assert served.shape == (2, 64)


def test_export_for_tpu_platform_from_cpu():
    """platforms=('tpu',) must lower+serialize host-side without a chip —
    the deployment path: export on a CPU build box, run on the TPU fleet."""
    policy = build_policy()
    data = serve.export_policy(policy, raw_obs(), platforms=("tpu",))
    assert isinstance(data, (bytes, bytearray)) and len(data) > 1000
    from jax import export as jexport

    exp = jexport.deserialize(data)
    assert "tpu" in [p.lower() for p in exp.platforms]


def test_example_obs_helper():
    from gymnasium.spaces import Box, Dict as DictSpace

    class _Env:
        observation_space = DictSpace(
            {
                "image": Box(0, 255, (2, 64, 64, 3), np.uint8),
                "tactile": Box(-np.inf, np.inf, (2, 6, 32, 32), np.float32),
            }
        )

    obs = serve.example_obs_for(_Env(), batch=4)
    assert obs["image"].shape == (4, 2, 64, 64, 3) and obs["image"].dtype == np.uint8
    assert obs["tactile"].shape == (4, 2, 6, 32, 32) and obs["tactile"].dtype == np.float32


def test_export_cli_end_to_end(tmp_path):
    """The export CLI: build FakeInsertion policy (random init), export a
    multi-platform artifact, reload-verify on the current backend."""
    from m3l_tpu.cli.export_policy import main

    out = str(tmp_path / "policy.shlo")
    main(
        [
            "--env", "FakeInsertion",
            "--dim_embedding", "64",
            "--frame_stack", "1",
            "--out", out,
            "--serve_batch", "1",
            "--platforms", "cpu", "tpu",
        ]
    )
    exported = serve.load_artifact(out)
    assert {p.lower() for p in exported.platforms} == {"cpu", "tpu"}
    obs = {
        "image": np.zeros((1, 1, 64, 64, 3), np.uint8),
        "tactile": np.zeros((1, 1, 6, 32, 32), np.float32),
    }
    actions = np.asarray(exported.call(obs))
    assert actions.shape[0] == 1 and np.isfinite(actions).all()
    assert np.all(actions >= -1.0) and np.all(actions <= 1.0)
