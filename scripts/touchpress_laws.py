"""Scripted-controller ceilings for the TouchPress-v0 ablation.

Evaluates hand-written control laws on a 5x5 grid over the env's two hidden
gains (plate stiffness k x servo gain kp) and reports the mean per-step
force error over the second half of the episode plus the mean episode
return. These are the ceilings the PPO ablation arms are compared against
(reference claim arXiv:2311.00924 / README.md:3: tactile information
improves policies that vision alone cannot complete).

Actions are incremental (env-side setpoint integration, DCTRL_MAX/step), so
a MEMORYLESS law in the observation is exactly what a reactive frame-stacked
policy can represent.

Laws:
  T-int    : touch only — a = -c*(F_target - F). An integral force
             controller: settles exactly at F_target for every hidden
             (k, kp) pair. Linear in the touch reading; the simplest
             law a policy can learn.
  V-depth  : vision only — regulate the VISIBLE finger depth to a fixed
             d*: a = -c*(q - d*). Equilibrium force = k * deflection(d*),
             so it pays the full stiffness spread.
  V-deflect: vision only — regulate the VISIBLE plate deflection to a
             fixed x*: a = -c*(x* - x_p). Equilibrium force = k*x*: also
             pays the stiffness spread, but deflection is the closest
             visible proxy of force.
  (The servo-error exploit ctrl = q - F/kp is no longer expressible at
  all: with incremental actions the absolute setpoint is internal env
  state, and kp is hidden anyway.)

Result (2026-08-17, deterministic grid, k in {80..1200} x kp in {30..160},
in-contact random-F0 start, reward clip [-1, 0]):
  T-int c=1.0           : mean err 0.000  worst 0.000  mean return  -2.8
  T-int c=0.5           : mean err 0.000  worst 0.000  mean return  -3.3
  best V-depth (-0.052) : mean err 0.483  worst 0.885  mean return -51.5
  best V-deflect (5mm)  : mean err 0.511  worst 0.900  mean return -54.2

i.e. touch feedback regulates exactly on every (k, kp) pair while the best
vision-only strategy pays ~0.5 of the target force in steady-state error
(episode-return ceiling about -51 vs -3, a 15x gap).

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
    errs, ret = [], 0.0
    for t in range(TouchPressEnv.HORIZON):
        q = float(env.data.qpos[1])
        F = env._force()
        if law == "T-int":
            a = -kw["c"] * (Ft - F)
        elif law == "V-depth":
            a = -50.0 * (q - kw["depth"])
        elif law == "V-deflect":
            xp = -float(env.data.qpos[0])
            a = -50.0 * (kw["x_star"] - xp)
        else:
            raise ValueError(law)
        _, r, _, _, _ = env.step([float(np.clip(a, -1.0, 1.0))])
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
    for c in (0.25, 0.5, 1.0):
        m, w, r = grid(env, "T-int", c=c)
        print(f"T-int c={c}: mean={m:.3f} worst={w:.3f} meanret={r:.1f}")
    for depth in (-0.048, -0.05, -0.052, -0.054, -0.06, -0.075):
        m, w, r = grid(env, "V-depth", depth=depth)
        print(f"V-depth d={depth}: mean={m:.3f} worst={w:.3f} meanret={r:.1f}")
    for x_star in (0.003, 0.005, 0.006, 0.008, 0.014):
        m, w, r = grid(env, "V-deflect", x_star=x_star)
        print(f"V-deflect x*={x_star}: mean={m:.3f} worst={w:.3f} meanret={r:.1f}")


if __name__ == "__main__":
    main()
