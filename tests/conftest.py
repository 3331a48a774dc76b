"""Test env normalization: the suite always runs on CPU with 8 virtual
devices so multi-chip sharding tests work without TPU hardware (SURVEY.md §4
rebuild test strategy).

The TPU plugin's sitecustomize (on PYTHONPATH) imports jax and initializes
the 'axon' backend at interpreter start — before any pytest code runs — which
pins the platform and device count for the whole process. The only reliable
fix is re-executing pytest with a cleaned environment. The re-exec happens in
``pytest_configure`` after stopping pytest's fd-level capture, so the child
process inherits the real stdout/stderr.
"""
import os
import sys

_MARK = "M3L_TESTS_REEXEC"


def _env_ok() -> bool:
    if os.environ.get(_MARK) == "1":
        return True
    return (
        os.environ.get("JAX_PLATFORMS", "") == "cpu"
        and "xla_force_host_platform_device_count=8" in os.environ.get("XLA_FLAGS", "")
        and "axon" not in os.environ.get("PYTHONPATH", "")
    )


def pytest_configure(config):
    if _env_ok():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ)
    env[_MARK] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    pythonpath = [p for p in env.get("PYTHONPATH", "").split(":") if p and "axon" not in p]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in pythonpath:
        pythonpath.insert(0, repo_root)
    env["PYTHONPATH"] = ":".join(pythonpath)
    # persistent compilation cache: CPU compiles dominate the suite's 40 min
    # on this 1-core host; a warm cache cuts repeat runs to execution-only
    # (the CLAUDE.md cache caveat is TPU-relay-only, same as the dryrun)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(repo_root, ".cache", "jax_tests"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.makedirs(env["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
    sys.stdout.flush()
    sys.stderr.flush()
    # run the real suite as a child sharing our (now uncaptured) stdio, then
    # exit with its code — more robust than execvpe, whose stdout can end up
    # in pytest's already-duplicated capture fds
    import subprocess

    proc = subprocess.run([sys.executable, "-m", "pytest", *config.invocation_params.args], env=env)
    os._exit(proc.returncode)
