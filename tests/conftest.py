"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4: "test multi-host logic on CPU
meshes"). Set QUPS_TPU_TEST_DEVICE=tpu to run against real hardware instead.

This environment force-registers a TPU PJRT plugin from a sitecustomize hook
before conftest runs, and that registration ignores ``JAX_PLATFORMS=cpu``.
To get a clean CPU jax, we re-exec pytest once with the site hook stripped
from PYTHONPATH (after restoring the capture fds so output is visible).
"""
import os
import sys

_WANT_CPU = os.environ.get("QUPS_TPU_TEST_DEVICE", "cpu") == "cpu"
_NEED_REEXEC = _WANT_CPU and not os.environ.get("_QUPS_TPU_TEST_SANITIZED")


def pytest_configure(config):
    if _NEED_REEXEC:
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()  # restore real stdout/stderr fds
        env = dict(os.environ)
        env["_QUPS_TPU_TEST_SANITIZED"] = "1"
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and ".axon_site" not in p
        )
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
        os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
    config.addinivalue_line(
        "markers",
        "full: exhaustive tier — deselected by default; run with "
        "QUPS_TEST_TIER=full (or -m full) like the reference's "
        "Github/full test tags (buildfile.m:57-76)")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: the default run deselects ``full``-marked tests
    (redundant parametrizations / exhaustive ablation rows — CI runs them
    in one nightly/opt-in job); an explicit ``-m`` or
    ``QUPS_TEST_TIER=full`` gets everything."""
    if config.option.markexpr:
        return
    if os.environ.get("QUPS_TEST_TIER", "fast") == "full":
        return
    keep, drop = [], []
    for it in items:
        (drop if it.get_closest_marker("full") else keep).append(it)
    if drop:
        config.hook.pytest_deselected(items=drop)
        items[:] = keep


if not _NEED_REEXEC:
    import jax

    jax.config.update("jax_enable_x64", False)
