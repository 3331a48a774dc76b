"""SAC+MAE integration tests on the fake env (CPU, tiny model)."""
import numpy as np
import pytest

from m3l_tpu.cli.train_sacmae import build_model, build_parser
from m3l_tpu.envs import SyncVecEnv, make_env
from m3l_tpu.rl.replay import ReplayBuffer


def tiny_args(**over):
    base = dict(
        env="FakeInsertion",
        n_envs=1,
        total_timesteps=64,
        buffer_size=512,
        learning_starts=16,
        batch_size=16,
        mae_batch_size=8,
        dim_embedding=32,
        frame_stack=2,
        compute_dtype="float32",
        subproc=False,
        verbose=0,
    )
    base.update(over)
    argv = []
    for k, v in base.items():
        argv += [f"--{k}", str(v)]
    return build_parser().parse_args(argv)


def make_model(**over):
    config = tiny_args(**over)
    env_fns = [make_env(config.env, i, config.seed, config.state_type, frame_stack=config.frame_stack) for i in range(config.n_envs)]
    env = SyncVecEnv(env_fns)
    return build_model(config, env), env


@pytest.mark.slow
@pytest.mark.parametrize("separate", [True, False])
def test_sac_learn_smoke(separate):
    model, env = make_model(separate_optimizer=separate)
    model.learn(total_timesteps=48)
    env.close()
    m = model.last_metrics
    for k in ["actor_loss", "critic_loss", "ent_coef", "mae_loss"]:
        assert k in m and np.isfinite(m[k]), (k, m)
    assert m["mae_loss"] > 0
    assert model._n_updates > 0


def test_sac_target_tracks_critic():
    import jax
    from m3l_tpu.rl.sac_mae import _flat_items

    model, env = make_model()
    # initially target == critic
    c0 = dict(_flat_items(model.critic_params))
    t0 = {k.replace("critic_target", "critic"): v for k, v in _flat_items(model.target_params)}
    for k in c0:
        np.testing.assert_array_equal(np.asarray(c0[k]), np.asarray(t0[k]))
    model.learn(total_timesteps=48)
    env.close()
    c1 = dict(_flat_items(model.critic_params))
    t1 = {k.replace("critic_target", "critic"): v for k, v in _flat_items(model.target_params)}
    # after updates: target != critic (tau=0.005) but both changed from init
    moved = [float(np.abs(np.asarray(c1[k]) - np.asarray(t1[k])).max()) for k in c1]
    assert max(moved) > 0
    assert all(np.isfinite(np.asarray(v)).all() for v in c1.values())


@pytest.mark.slow
def test_sac_fixed_ent_coef():
    model, env = make_model(ent_coef="0.2")
    model.learn(total_timesteps=48)
    env.close()
    assert abs(model.last_metrics["ent_coef"] - 0.2) < 1e-6
    assert "ent_coef_loss" not in model.last_metrics


@pytest.mark.slow
def test_sac_auto_ent_coef_moves():
    model, env = make_model()
    e0 = float(np.exp(np.asarray([l for l in __import__('jax').tree.leaves(model.ent_params)])[0]))
    model.learn(total_timesteps=64)
    env.close()
    e1 = model.last_metrics["ent_coef"]
    assert e0 == pytest.approx(1.0)
    assert e1 != pytest.approx(1.0)


def test_replay_buffer_ring_and_timeout():
    from gymnasium.spaces import Box, Dict as DictSpace

    obs_space = DictSpace({"image": Box(0, 255, (2, 8, 8, 3), np.uint8)})
    buf = ReplayBuffer(capacity=8, n_envs=1, obs_space=obs_space, action_dim=2)
    rng = np.random.default_rng(0)
    for t in range(12):  # wraps the ring (capacity 8)
        obs = {"image": np.full((1, 2, 8, 8, 3), t % 250, np.uint8)}
        trunc = t == 5
        infos = [{"TimeLimit.truncated": trunc, **({"terminal_observation": {"image": np.full((2, 8, 8, 3), 77, np.uint8)}} if trunc else {})}]
        buf.add(obs, np.zeros((1, 2)), np.ones(1), np.array([trunc]), infos)
    assert buf.full and len(buf) == 8
    batch = buf.sample(64, rng)
    # next_obs must be obs value + 1 (ring adjacency) except timeout patches
    o = batch["obs"]["image"][:, 0, 0, 0, 0].astype(int)
    n = batch["next_obs"]["image"][:, 0, 0, 0, 0].astype(int)
    for j in range(64):
        if n[j] == 77:
            assert o[j] == 5  # the truncated step got its terminal obs
        else:
            assert n[j] == o[j] + 1, (o[j], n[j])
    # timeouts are not terminal for bootstrapping
    assert batch["dones"][o == 5].sum() == 0


def test_sac_predict_bounds():
    model, env = make_model()
    obs = env.reset(seed=0)
    a = model.predict(obs, deterministic=True)
    assert a.shape == (1, env.action_space.shape[0])
    assert (np.abs(a) <= 1.0).all()
    env.close()


@pytest.mark.slow
def test_sac_fused_multi_update_device_buffer():
    """G gradient steps fuse into one dispatch on the HBM ring and keep
    learning semantics: n_updates advances by G per train event, metrics are
    finite, and params move."""
    import jax

    model, env = make_model(n_envs=2, device_buffer=True, gradient_steps=4, batch_size=8)
    assert model._multi_update is not None
    a0 = jax.tree.map(lambda x: np.asarray(x).copy(), model.actor_params)
    model.learn(total_timesteps=32)
    env.close()
    assert model._n_updates % 4 == 0 and model._n_updates >= 4
    for k in ["actor_loss", "critic_loss", "ent_coef", "mae_loss"]:
        assert k in model.last_metrics and np.isfinite(model.last_metrics[k])
    moved = any(
        not np.allclose(np.asarray(x), y)
        for x, y in zip(jax.tree.leaves(model.actor_params), jax.tree.leaves(a0))
    )
    assert moved
