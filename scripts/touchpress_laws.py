"""Scripted-controller ceilings for the TouchPress-v0 ablation.

Evaluates hand-written control laws on a 5x5 grid over the env's two hidden
gains (plate stiffness k x servo gain kp) and reports the mean per-step
force error over the second half of the episode plus the mean episode
return. These are the ceilings the PPO ablation arms are compared against
(reference claim arXiv:2311.00924 / README.md:3: tactile information
improves policies that vision alone cannot complete).

Laws:
  T-2frame : touch + pixels, the 2-frame-exact law a deterministic
             frame_stack=2 policy can represent — recompute the previous
             command from the previous frame, identify kp = F/(q-ctrl_prev)
             from the realized force, command ctrl = q - F_target/kp.
  V-servo  : vision-only exploit of a FIXED servo gain (the leak that
             motivated hiding kp): ctrl = q - F_target/kp_hat.
  V-deflect: vision-only, press until the visible plate deflection matches
             F_target/k_hat.
  V-depth  : vision-only, press to a fixed depth.

Result (2026-08-17, seed-free deterministic grid):
  T-2frame            : mean err 0.000  worst 0.000  mean return  -5.5
  best V-servo (140)  : mean err 0.313  worst 0.639  mean return -34.7
  best V-depth (-0.1) : mean err 0.375  worst 0.968  mean return -38.4
  best V-deflect (250): mean err 0.721  worst 0.826  mean return -74.2

i.e. touch feedback regulates exactly on every (k, kp) pair while the best
vision-only strategy pays >=0.3 of the target force in steady-state error
(episode-return ceiling about -35 vs -5.5 for touch).

Run: JAX_PLATFORMS=cpu python scripts/touchpress_laws.py
"""
from __future__ import annotations

import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m3l_tpu.envs.touch_press import TouchPressEnv

Ft = TouchPressEnv.F_TARGET
KS = [80, 200, 400, 800, 1200]
KPS = [30, 60, 90, 120, 160]


def _setup(env: TouchPressEnv, k: float, kp: float) -> None:
    """reset(), then pin the two hidden gains to a grid point."""
    env.reset(seed=0)
    env.model.jnt_stiffness[env._plate_jnt] = k
    env.model.dof_damping[env.model.jnt_dofadr[env._plate_jnt]] = 1.8 * np.sqrt(0.15 * k)
    env.model.qpos_spring[env.model.jnt_qposadr[env._plate_jnt]] = 0.15 * 9.81 / k
    env.model.actuator_gainprm[0, 0] = kp
    env.model.actuator_biasprm[0, 1] = -kp
    env._mujoco.mj_forward(env.model, env.data)


def episode(env: TouchPressEnv, law: str, k: float, kp: float, **kw):
    _setup(env, k, kp)
    lo, hi = env._ctrl_lo, env._ctrl_hi
    ctrl = float(env.data.ctrl[0])
    prev_ctrl = ctrl
    errs, ret = [], 0.0
    for t in range(TouchPressEnv.HORIZON):
        q = float(env.data.qpos[1])
        F = env._force()
        if law == "T-2frame":
            if F < 0.2:
                ctrl = q - 0.02
            else:
                kp_hat = max(F / max(q - prev_ctrl, 1e-4), 5.0)
                ctrl = q - Ft / kp_hat
        elif law == "V-servo":
            ctrl = (q - 0.02) if F < 0.2 else q - Ft / kw["kp_hat"]
        elif law == "V-deflect":
            xp = -float(env.data.qpos[0])
            ctrl = q - kw["beta"] * (Ft / kw["k_hat"] - xp)
        elif law == "V-depth":
            ctrl = kw["depth"]
        else:
            raise ValueError(law)
        prev_ctrl = ctrl
        ctrl = float(np.clip(ctrl, lo, hi))
        _, r, _, _, _ = env.step([2.0 * (ctrl - lo) / (hi - lo) - 1.0])
        ret += r
        if t >= TouchPressEnv.HORIZON // 2:
            errs.append(abs(env._force() - Ft) / Ft)
    return float(np.mean(errs)), ret


def grid(env: TouchPressEnv, law: str, **kw):
    out = [episode(env, law, k, kp, **kw) for k, kp in itertools.product(KS, KPS)]
    errs, rets = zip(*out)
    return float(np.mean(errs)), float(np.max(errs)), float(np.mean(rets))


def main() -> None:
    env = TouchPressEnv()
    m, w, r = grid(env, "T-2frame")
    print(f"T-2frame: mean={m:.3f} worst={w:.3f} meanret={r:.1f}")
    for kp_hat in (60, 75, 100, 140):
        m, w, r = grid(env, "V-servo", kp_hat=kp_hat)
        print(f"V-servo kp_hat={kp_hat}: mean={m:.3f} worst={w:.3f} meanret={r:.1f}")
    for k_hat in (250, 400, 550):
        m, w, r = grid(env, "V-deflect", k_hat=k_hat, beta=0.5)
        print(f"V-deflect k_hat={k_hat}: mean={m:.3f} worst={w:.3f} meanret={r:.1f}")
    for depth in (-0.06, -0.08, -0.1, -0.12):
        m, w, r = grid(env, "V-depth", depth=depth)
        print(f"V-depth d={depth}: mean={m:.3f} worst={w:.3f} meanret={r:.1f}")


if __name__ == "__main__":
    main()
