"""Export a trained PPO+MAE policy checkpoint to a serving artifact.

TPU-native bonus with no reference counterpart (the reference deploys by
re-running the torch module in-process): produces a self-contained
StableHLO artifact (m3l_tpu/serve.py) computing raw obs -> actions, which
any matching JAX runtime executes without m3l_tpu code or checkpoints.

Takes the SAME model flags as ``m3l_tpu.cli.train`` (the architecture must
match the checkpoint) plus::

    python -m m3l_tpu.cli.export_policy --env FakeInsertion \
        --dim_embedding 128 --frame_stack 2 \
        --ckpt runs/.../model_400000_steps.ckpt --out policy.shlo \
        --serve_batch 1 --platforms tpu

The export is verified by reloading the artifact and comparing against the
in-process policy on the current backend (skipped when the artifact's
platform set excludes it).
"""
from __future__ import annotations

import numpy as np


def main(argv=None):
    from .. import serve
    from ..envs import make_env, make_vec_env
    from .train import build_model, build_parser

    parser = build_parser()
    parser.add_argument("--ckpt", default=None, help="checkpoint from CheckpointCallback / PPOMAE.save (omit to export the random init, e.g. for pipeline tests)")
    parser.add_argument("--out", required=True, help="artifact output path")
    parser.add_argument("--serve_batch", type=int, default=1, help="static serving batch size (one artifact per signature)")
    parser.add_argument("--platforms", nargs="+", default=None, help="lowering platforms, e.g. tpu cpu; default: current backend")
    parser.add_argument("--stochastic", action="store_true", help="export the sampling policy (obs, key) -> actions instead of the deterministic mean")
    config = parser.parse_args(argv)

    env = make_vec_env(
        [make_env(config.env, 0, config.seed, config.state_type, frame_stack=config.frame_stack, allow_fake=config.allow_fake)],
        subproc=False,
    )
    try:
        model = build_model(config, env)
        if config.ckpt:
            model.load(config.ckpt)
            print(f"[export] restored {config.ckpt} (num_timesteps={model.num_timesteps})")
        else:
            print("[export] WARNING: no --ckpt given, exporting the random init")

        obs = serve.example_obs_for(env, batch=config.serve_batch, frame_stack=config.frame_stack)
        platforms = tuple(config.platforms) if config.platforms else None
        data = serve.export_policy(
            model.policy,
            obs,
            deterministic=not config.stochastic,
            action_low=env.action_space.low,
            action_high=env.action_space.high,
            platforms=platforms,
        )
        serve.save_artifact(config.out, data)
        print(f"[export] wrote {config.out} ({len(data) / 1e6:.1f} MB, platforms={list(platforms) if platforms else 'default'})")

        import jax

        exported = serve.load_artifact(config.out)
        if jax.default_backend() in [p.lower() for p in exported.platforms]:
            args = (obs,) if not config.stochastic else (obs, jax.random.PRNGKey(0))
            served = np.asarray(exported.call(*args))
            if config.stochastic:
                direct, _, _ = model.policy.step(obs, jax.random.PRNGKey(0))
            else:
                direct, _, _ = model.policy._dist_params(obs)
            direct = np.clip(np.asarray(direct), env.action_space.low, env.action_space.high)
            print(f"[export] verified reload: max|served-direct| = {np.abs(served - direct).max():.2e}")
        else:
            print(f"[export] reload verification skipped (artifact platforms {exported.platforms} exclude backend {jax.default_backend()})")
    finally:
        env.close()


if __name__ == "__main__":
    main()
