"""Real-MuJoCo env family (EGL render + touch sensors) + GSPMD equivalence."""
import numpy as np
import pytest


def test_mujoco_pixels_env():
    """EGL rendering must run in a clean subprocess: initializing an EGL
    context inside the test process segfaults once TF/torch have loaded
    their own GL stacks (observed under the full suite)."""
    pytest.importorskip("mujoco")
    import os
    import subprocess
    import sys

    code = """
import os
os.environ["MUJOCO_GL"] = "egl"
import numpy as np
from m3l_tpu.envs import make_env
env = make_env("MuJoCoPixels/Ant-v5", 0, 0, "vision_and_touch", frame_stack=2)()
obs, _ = env.reset(seed=0)
assert obs["image"].shape == (2, 64, 64, 3) and obs["image"].dtype == np.uint8
assert obs["tactile"].shape == (2, 3, 32, 32)
obs, r, term, trunc, info = env.step(env.action_space.sample())
assert np.isfinite(r)
env.close()
print("MUJOCO_PIXELS_OK")
"""
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", code], env=env, capture_output=True, text=True, timeout=300)
    assert "MUJOCO_PIXELS_OK" in out.stdout, out.stdout + out.stderr


def test_hand_touch_sensors_env():
    """Shadow-hand rotation family with REAL MuJoCo touch sensors: the
    `ensure_patched_hand_xmls` shim (envs/hand_assets.py) must make
    gymnasium-robotics 1.4 assets load under MuJoCo >= 3.2, and the pipeline
    (PixelsOnly + ResizeDict + AddTactile, reference envs/__init__.py:70-76)
    must deliver pixels + a nonzero touch map. Subprocess-isolated for the
    same EGL reason as above."""
    pytest.importorskip("mujoco")
    pytest.importorskip("gymnasium_robotics")
    import os
    import subprocess
    import sys

    code = """
import os
os.environ["MUJOCO_GL"] = "egl"
import numpy as np
from m3l_tpu.envs import make_env
env = make_env("HandManipulateBlockRotateZ_ContinuousTouchSensors-v1", 0, 0,
               "vision_and_touch", frame_stack=2, allow_fake=False)()
obs, _ = env.reset(seed=0)
assert obs["image"].shape == (2, 64, 64, 3) and obs["image"].dtype == np.uint8
assert obs["tactile"].shape == (2, 3, 32, 32)
touched = 0.0
for _ in range(20):
    obs, r, term, trunc, info = env.step(env.action_space.sample())
    assert np.isfinite(r) and r <= 0.0  # dense reward = -distance
    touched = max(touched, float(np.abs(obs["tactile"]).max()))
assert touched > 0.0  # the 92 touch sensors actually fire under contact
env.close()
print("HAND_TOUCH_OK")
"""
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", code], env=env, capture_output=True, text=True, timeout=300)
    assert "HAND_TOUCH_OK" in out.stdout, out.stdout + out.stderr


def test_touch_helpers():
    from m3l_tpu.envs.wrappers import assemble_hand_tactile

    tac = assemble_hand_tactile(np.ones(17, np.float32), 32)
    assert tac.shape == (3, 32, 32)
    assert tac.max() > 0  # sensors landed in the layout
    empty = assemble_hand_tactile(np.zeros(0, np.float32), 32)
    assert (empty == 0).all()


@pytest.mark.slow
def test_dp_sharded_update_matches_single_device():
    """GSPMD correctness: the fused PPO+MAE update on a 4-way dp mesh must
    produce (numerically close) identical metrics to the unsharded run."""
    import jax
    from m3l_tpu.cli.train import build_model, build_parser
    from m3l_tpu.envs import SyncVecEnv, make_env
    from m3l_tpu.rl import PPOMAE
    from m3l_tpu.train.mesh import make_mesh

    argv = []
    for k, v in dict(env="FakeInsertion", n_envs=4, rollout_length=64, batch_size=16, ppo_epochs=1,
                     dim_embedding=32, frame_stack=1, mae_batch_size=8, compute_dtype="float32",
                     subproc=False, verbose=0).items():
        argv += [f"--{k}", str(v)]
    config = build_parser().parse_args(argv)

    def run(mesh):
        env = SyncVecEnv([make_env(config.env, i, 0, config.state_type, frame_stack=1) for i in range(4)])
        base = build_model(config, env)
        model = PPOMAE(
            base.policy, env, n_steps=16, batch_size=16, n_epochs=1, mae_batch_size=8,
            frame_stack=1, seed=0, verbose=0, mesh=mesh,
        )
        model.collect_rollouts()
        metrics = model.train()
        env.close()
        return metrics

    m_single = run(None)
    m_dp = run(make_mesh(4, mp=1))
    for k in ("mae_loss", "policy_loss", "value_loss"):
        np.testing.assert_allclose(m_single[k], m_dp[k], rtol=2e-3, atol=2e-4)


def test_touch_press_env():
    """TouchPress-v0 (in-repo force-regulation env, envs/touch_press.py):
    pixels+touch pipeline shapes, per-episode randomization of BOTH hidden
    gains (plate stiffness k and servo gain kp) with gravity-sag compensation
    (rest pose identical across k), and solvability: a force-feedback
    controller on the touch reading reaches the target band on every (k, kp),
    which a pixels-only policy cannot (both gains are invisible).
    Subprocess-isolated for EGL."""
    pytest.importorskip("mujoco")
    import os
    import subprocess
    import sys

    code = """
import os
os.environ["MUJOCO_GL"] = "egl"
import numpy as np
from m3l_tpu.envs import make_env
env = make_env("MuJoCoPixels/TouchPress-v0", 0, 0, "vision_and_touch", frame_stack=2, allow_fake=False)()
obs, _ = env.reset(seed=0)
assert obs["image"].shape == (2, 64, 64, 3) and obs["image"].dtype == np.uint8
assert obs["tactile"].shape == (2, 3, 32, 32)
inner = env.env.env.unwrapped
rest = []
for ep in range(2):
    env.reset(seed=50 + ep)
    rest.append((inner._force(), float(inner.model.jnt_stiffness[inner._plate_jnt]),
                 float(inner.model.actuator_gainprm[0, 0])))
ks = {round(k) for _, k, _ in rest}
kps = {round(kp) for _, _, kp in rest}
assert len(ks) == 2  # plate stiffness actually varies
assert len(kps) == 2  # servo gain actually varies (closes the F=kp*dq leak)
# episodes start IN CONTACT with a random press force (regulation task:
# reward gradient from step 0), and the start force itself varies
f0s = [f for f, _, _ in rest]
assert all(f > 0.1 for f in f0s), f0s
assert abs(f0s[0] - f0s[1]) > 0.05, f0s
succ = []
for ep in range(2):
    env.reset(seed=200 + ep)
    for _ in range(100):
        # memoryless integral force law (actions are setpoint increments)
        a = np.clip([-0.5 * (4.0 - inner._force())], -1, 1).astype(np.float32)
        o, r, te, tr, info = env.step(a)
    succ.append(info["is_success"])
    assert np.abs(o["tactile"]).max() > 0.0
assert all(succ), succ
# Reward-floor property: pressing far past the target force must never score
# WORSE than hovering out of contact (-1/step), or PPO exploration collapses
# to contact avoidance (observed: flat -100.00 for 229k steps under a [-2,0]
# clip). Drive to the bottom stop and compare against the no-contact reward.
env.reset(seed=300)
for _ in range(20):  # retreat fully out of contact
    r_hover = env.step(np.array([1.0], np.float32))[1]
assert r_hover == -1.0, r_hover
for _ in range(60):
    o, r_press, te, tr, info = env.step(np.array([-1.0], np.float32))
assert inner._force() > 2 * inner.F_TARGET  # genuinely overshooting
assert r_press >= r_hover, (r_press, r_hover)
env.close()
print("TOUCH_PRESS_OK")
"""
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", code], env=env, capture_output=True, text=True, timeout=300)
    assert "TOUCH_PRESS_OK" in out.stdout, out.stdout + out.stderr
