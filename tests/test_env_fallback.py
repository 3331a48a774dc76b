"""Real-env availability must fail loudly, never silently fake (VERDICT r2 #5).

The reference factory has no fallback at all (reference envs/__init__.py:12-96);
ours allows FakeInsertionEnv substitution only with allow_fake=True, printing
a warning. CLIs default to allow_fake=False.
"""
import pytest


def test_insertion_without_package_raises():
    from m3l_tpu.envs import make_env

    with pytest.raises(ImportError):
        make_env("tactile_envs/Insertion-v0", 0, 0, allow_fake=False)()


def test_door_without_package_raises():
    from m3l_tpu.envs import make_env

    with pytest.raises(ImportError):
        make_env("Door", 0, 0, allow_fake=False)()


def test_fallback_warns(capfd):
    from m3l_tpu.envs import make_env

    env = make_env("tactile_envs/Insertion-v0", 0, 0, allow_fake=True)()
    err = capfd.readouterr().err
    assert "substituting FakeInsertionEnv" in err
    env.close()


def test_cli_default_is_strict():
    from m3l_tpu.cli.train import build_parser

    config = build_parser().parse_args(["--env", "tactile_envs/Insertion-v0"])
    assert config.allow_fake is False
