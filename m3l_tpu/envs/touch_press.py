"""TouchPress-v0: a real-MuJoCo force-regulation env where touch is load-bearing.

A position-actuated fingertip must press a spring-mounted plate to a target
contact force. TWO gains are randomized per episode and are INVISIBLE to the
camera, so every pixel-observable quantity maps to a different force each
episode and regulating force requires reading the fingertip's MuJoCo touch
sensor:

* plate stiffness k ~ U(80, 1200) N/m — the same plate deflection means a
  15x different contact force;
* servo gain kp ~ U(30, 160) N/m — the same finger servo error means an
  8x different pressing force. (With a FIXED kp this env is solvable from
  pixels alone: a reactive policy can command ctrl = q_finger - F/kp and the
  servo converts the visible position error into an exact force — both arms
  of the ablation learned identical curves until kp was hidden too.)

The action is INCREMENTAL: a in [-1, 1] moves the servo setpoint by up to
DCTRL_MAX per step (the setpoint integrates env-side, like a velocity /
impedance command). This makes the touch-feedback solution a memoryless
linear law — a = -c * (F_target - F) is an integral force controller that
settles exactly at F_target for EVERY hidden (k, kp) pair — while a
vision-only policy still cannot form F: at best it can regulate a visible
quantity (finger depth or plate deflection), whose equilibrium force is
k * deflection and therefore pays the full 15x stiffness spread. This gives
the vision+touch real-physics path (reference claim README.md:3,
arXiv:2311.00924: tactile information improves policies that vision alone
cannot complete) a controlled, learnable testbed with an explicit
vision-only ablation:

    PPO(state_type=vision_and_touch)  -> can regulate to the target band
    PPO(state_type=vision)            -> plateaus at the hidden-gain floor

Exposed through the factory as ``MuJoCoPixels/TouchPress-v0`` (registered on
import); `RenderImageObservation` renders the camera and maps the touch
sensor into the (3, 32, 32) tactile image via `assemble_hand_tactile`.
"""
from __future__ import annotations

import numpy as np

import gymnasium as gym
from gymnasium.spaces import Box

_XML = """
<mujoco model="touchpress">
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <visual>
    <global offwidth="128" offheight="128"/>
    <quality shadowsize="0" offsamples="0"/>
    <headlight ambient="0.4 0.4 0.4" diffuse="0.6 0.6 0.6"/>
  </visual>
  <worldbody>
    <light pos="0.2 0.2 1" dir="-0.2 -0.2 -1" castshadow="false"/>
    <geom name="floor" type="plane" size="1 1 0.1" rgba="0.25 0.27 0.32 1"/>
    <body name="base" pos="0 0 0.035">
      <geom name="pedestal" type="cylinder" size="0.05 0.035" rgba="0.4 0.4 0.45 1"/>
    </body>
    <body name="plate" pos="0 0 0.22">
      <joint name="plate_z" type="slide" axis="0 0 1" range="-0.12 0"
             stiffness="300" damping="8" limited="true"/>
      <geom name="plate_geom" type="box" size="0.07 0.07 0.02" mass="0.15"
            solref="0.02 1" rgba="0.85 0.55 0.2 1"/>
    </body>
    <body name="finger" pos="0 0 0.3">
      <joint name="finger_z" type="slide" axis="0 0 1" range="-0.28 0.04"
             damping="6" limited="true"/>
      <geom name="shaft" type="capsule" fromto="0 0 0.01 0 0 0.1" size="0.008"
            rgba="0.6 0.62 0.68 1" mass="0.04"/>
      <geom name="tip" type="sphere" size="0.014" rgba="0.2 0.6 0.9 1" mass="0.02"/>
      <site name="tip_site" type="sphere" size="0.016" rgba="1 0 0 0"/>
    </body>
    <camera name="view" pos="0.38 0 0.34" xyaxes="0 1 0 -0.2 0 1"/>
  </worldbody>
  <actuator>
    <position name="press" joint="finger_z" kp="60" ctrlrange="-0.28 0.04"/>
  </actuator>
  <sensor>
    <touch name="tip_touch" site="tip_site"/>
  </sensor>
</mujoco>
"""


class TouchPressEnv(gym.Env):
    """Regulate fingertip contact force on a randomized-stiffness plate.

    Observation (dict): proprioceptive state is withheld — built for the
    pixels(+touch) pipeline, so `render()` is the intended observation and
    the raw obs is the minimal qpos/force vector (used by tests only).
    Action: 1-d INCREMENT of the fingertip servo setpoint, in [-1, 1]
    scaled to +-DCTRL_MAX metres per step; the setpoint integrates env-side
    and is clipped to the ctrlrange. Reward: -|F - F_target|/F_target per
    step, clipped to [-1, 0] — the clip floor equals the no-contact reward
    (F=0 -> err=1) so pressing too hard is never WORSE than not touching.
    (With a [-2, 0] clip, un-regulated pressing bottoms the plate out at up
    to ~30x the target force, every early pressing episode scores -150..-200
    against a safe -100 for hovering, and PPO converges to never touching:
    observed flat at exactly -100.00 for 229k steps.) Episode: 100 steps, no
    termination.
    `info["is_success"]`: >=60% of the episode's second half spent within
    +-25% of the target force.
    """

    metadata = {"render_modes": ["rgb_array"], "render_fps": 40}

    F_TARGET = 4.0
    HORIZON = 100
    DCTRL_MAX = 0.01  # metres of setpoint travel per env step

    def __init__(self, render_mode: str = "rgb_array", width: int = 64, height: int = 64):
        import mujoco

        self._mujoco = mujoco
        self.model = mujoco.MjModel.from_xml_string(_XML)
        self.data = mujoco.MjData(self.model)
        self.render_mode = render_mode
        self._renderer = None
        self._width, self._height = width, height
        self._plate_jnt = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_JOINT, "plate_z")
        self._touch_adr = self.model.sensor_adr[
            mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_SENSOR, "tip_touch")
        ]
        self._ctrl_lo, self._ctrl_hi = self.model.actuator_ctrlrange[0]
        self.action_space = Box(low=-1.0, high=1.0, shape=(1,), dtype=np.float32)
        self.observation_space = Box(low=-np.inf, high=np.inf, shape=(4,), dtype=np.float32)
        self._rng = np.random.default_rng(0)
        self._t = 0
        self._in_band = 0

    # -- helpers ---------------------------------------------------------- #
    def _force(self) -> float:
        return float(self.data.sensordata[self._touch_adr])

    def _state(self) -> np.ndarray:
        return np.array(
            [self.data.qpos[0], self.data.qpos[1], self.data.qvel[1], self._force()],
            np.float32,
        )

    # -- gym API ---------------------------------------------------------- #
    def reset(self, seed=None, options=None):
        if seed is not None:
            self._rng = np.random.default_rng(seed)
        self._mujoco.mj_resetData(self.model, self.data)
        # per-episode stiffness: same pixels, different force law. The spring
        # reference absorbs the gravity sag (q_rest = springref - m*g/k) so the
        # plate's REST height is identical for every stiffness — otherwise the
        # sag would leak the stiffness to the camera.
        # 15x stiffness spread: the best fixed-deflection (vision-only)
        # policy's expected force error is >0.5 of target, while force
        # feedback is stiffness-agnostic — this separates the ablation arms.
        plate_mass = 0.15
        k = self._rng.uniform(80.0, 1200.0)
        dofadr = self.model.jnt_dofadr[self._plate_jnt]
        self.model.jnt_stiffness[self._plate_jnt] = k
        # near-critical plate damping at every k: constant damping would make
        # soft episodes bouncy and stiff ones overdamped (and the contact
        # bounce loop wrecks force regulation for BOTH arms).
        self.model.dof_damping[dofadr] = 1.8 * np.sqrt(plate_mass * k)
        qposadr = self.model.jnt_qposadr[self._plate_jnt]
        self.model.qpos_spring[qposadr] = plate_mass * 9.81 / k
        # Hidden servo gain (see module docstring): with kp fixed, vision
        # reads force off the servo's own spring (F = kp * visible position
        # error), bypassing touch entirely. MuJoCo position actuator:
        # gainprm[0] = kp, biasprm = (0, -kp, -kv).
        kp = self._rng.uniform(30.0, 160.0)
        self.model.actuator_gainprm[0, 0] = kp
        self.model.actuator_biasprm[0, 1] = -kp
        # Start every episode IN CONTACT, pressing with a random force
        # F0 ~ U(0.5, 7) N (err 0.05-0.88 vs the 4 N target). The task is
        # force REGULATION, not reaching: with incremental actions the
        # initial policy's mean-action bias (~+-0.1) integrates to ~10 cm of
        # setpoint drift per episode, so episodes started out of contact
        # almost never touch under exploration (observed: ~0.02% touch
        # steps, ep_rew pinned at the -100 no-contact floor for 229k+
        # steps). Starting on the reward gradient gives both ablation arms
        # signal from step 0; only touch can tell WHICH force it starts at
        # (the same F0 looks different on camera for every hidden k). The
        # servo setpoint is placed past the contact point by F0/kp (finger
        # weight folded in) and a short settle loop reaches the near-
        # critically-damped equilibrium before the first observation.
        contact_q = -0.046
        f0 = self._rng.uniform(0.5, 7.0)
        self.data.qpos[1] = contact_q
        self.data.ctrl[0] = contact_q - (f0 - 0.06 * 9.81) / kp
        self._mujoco.mj_forward(self.model, self.data)
        for _ in range(40):  # 0.2 s settle at the episode's (k, kp)
            self._mujoco.mj_step(self.model, self.data)
        self._t = 0
        self._in_band = 0
        return self._state(), {}

    def step(self, action):
        a = float(np.clip(np.asarray(action).ravel()[0], -1.0, 1.0))
        self.data.ctrl[0] = np.clip(
            self.data.ctrl[0] + a * self.DCTRL_MAX, self._ctrl_lo, self._ctrl_hi
        )
        for _ in range(4):  # 50 Hz control over 5 ms physics steps
            self._mujoco.mj_step(self.model, self.data)
        self._t += 1
        f = self._force()
        err = abs(f - self.F_TARGET) / self.F_TARGET
        reward = -min(err, 1.0)
        if self._t > self.HORIZON // 2 and err < 0.25:
            self._in_band += 1
        truncated = self._t >= self.HORIZON
        info = {}
        if truncated:
            info["is_success"] = self._in_band >= 0.6 * (self.HORIZON // 2)
        return self._state(), reward, False, truncated, info

    def render(self):
        if self._renderer is None:
            import mujoco

            self._renderer = mujoco.Renderer(self.model, height=self._height, width=self._width)
        self._renderer.update_scene(self.data, camera="view")
        return self._renderer.render()

    def close(self):
        if self._renderer is not None:
            self._renderer.close()
            self._renderer = None


def register():
    """Idempotently register TouchPress-v0 with gymnasium."""
    if "TouchPress-v0" not in gym.registry:
        gym.register(
            id="TouchPress-v0",
            entry_point="m3l_tpu.envs.touch_press:TouchPressEnv",
            max_episode_steps=TouchPressEnv.HORIZON,
        )
