"""End-to-end PPO+MAE integration tests on the fake env (CPU, tiny model)."""
import numpy as np
import pytest

from m3l_tpu.cli.train import build_model, build_parser
from m3l_tpu.envs import SyncVecEnv, make_env


def tiny_args(**over):
    base = dict(
        env="FakeInsertion",
        n_envs=2,
        total_timesteps=256,
        rollout_length=128,
        batch_size=32,
        ppo_epochs=2,
        dim_embedding=32,
        frame_stack=2,
        mae_batch_size=8,
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
@pytest.mark.parametrize("separate", [False, True])
def test_learn_smoke(separate):
    model, env = make_model(separate_optimizer=separate)
    model.learn(total_timesteps=256)
    env.close()
    assert model.num_timesteps >= 256
    m = model.last_metrics
    for k in ["policy_loss", "value_loss", "entropy_loss", "approx_kl", "clip_fraction", "mae_loss", "explained_variance"]:
        assert k in m, k
        assert np.isfinite(m[k]) or k == "explained_variance", (k, m[k])
    assert m["mae_loss"] > 0
    # all minibatches executed (no KL stop configured)
    assert m["n_updates_executed"] == model.n_epochs * model.n_minibatches


@pytest.mark.slow
def test_parameters_change_and_stay_finite():
    import jax

    model, env = make_model()
    before = jax.tree.map(lambda x: np.asarray(x).copy(), model.mae_params)
    model.learn(total_timesteps=256)
    env.close()
    after = model.mae_params
    changed = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()), after, before)
    assert max(jax.tree.leaves(changed)) > 0, "MAE params did not update"
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(after))


@pytest.mark.slow
def test_kl_early_stop_executes_fewer_updates():
    model, env = make_model()
    model.target_kl = 1e-9  # force immediate stop
    model._build_jits()
    model.collect_rollouts()
    metrics = model.train()
    env.close()
    assert metrics["n_updates_executed"] < model.n_epochs * model.n_minibatches


@pytest.mark.slow
def test_vision_only_control():
    model, env = make_model(vision_only_control=True)
    model.learn(total_timesteps=256)
    env.close()
    assert np.isfinite(model.last_metrics["mae_loss"])


def test_predict_deterministic():
    model, env = make_model()
    obs = env.reset(seed=0)
    a1 = model.predict(obs, deterministic=True)
    a2 = model.predict(obs, deterministic=True)
    np.testing.assert_array_equal(a1, a2)
    assert a1.shape == (2, env.action_space.shape[0])
    assert (a1 >= env.action_space.low - 1e-6).all() and (a1 <= env.action_space.high + 1e-6).all()
    env.close()


@pytest.mark.slow
def test_state_dict_roundtrip():
    import jax

    model, env = make_model()
    model.learn(total_timesteps=256)
    sd = model.state_dict()
    model2, env2 = make_model()
    model2.load_state_dict(sd)
    obs = env.reset(seed=1)
    np.testing.assert_allclose(
        model.predict(obs, deterministic=True), model2.predict(obs, deterministic=True), rtol=1e-5, atol=1e-6
    )
    env.close()
    env2.close()
