"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(hypothesis batch over a jax.sharding.Mesh) are exercised without TPU
hardware.  The env vars must be in force before jax initializes.

This image's sitecustomize (``/root/.axon_site`` on PYTHONPATH) imports jax
and registers the TPU tunnel plugin at *interpreter startup* — before this
conftest runs — so from a default shell the flags below would be set too
late and the "CPU" suite would silently run through the TPU tunnel (slow,
and spuriously failing).  When that is detected, pytest re-execs itself in a
scrubbed environment (from pytest_configure, after suspending output
capture so the child's report streams through); if the scrub somehow fails
to take, abort loudly with the manual incantation instead of running on the
wrong backend.
"""

import os
import sys

_SCRUBBED_ENV = {
    "PYTHONPATH": "",
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}
_MANUAL_FIX = (
    "run the suite as: env PYTHONPATH= JAX_PLATFORMS=cpu "
    "XLA_FLAGS=--xla_force_host_platform_device_count=8 python -m pytest tests/"
)

_NEEDS_REEXEC = "jax" in sys.modules

if _NEEDS_REEXEC:
    if os.environ.get("_DD_CONFTEST_REEXEC"):
        raise RuntimeError(
            "conftest: jax is pre-imported even after a scrubbed re-exec; " + _MANUAL_FIX
        )
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _xla_flags:
        os.environ["XLA_FLAGS"] = (
            _xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_enable_x64", False)

    if jax.default_backend() != "cpu":
        raise RuntimeError(
            f"conftest: suite initialized on backend {jax.default_backend()!r}, "
            "not 'cpu' — refusing to run on the wrong backend; " + _MANUAL_FIX
        )


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    # Release pytest's fd-level capture so the re-exec'd run's output
    # reaches the terminal instead of a doomed capture tempfile.
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = {**os.environ, **_SCRUBBED_ENV, "_DD_CONFTEST_REEXEC": "1"}
    argv = [sys.executable, "-m", "pytest", *config.invocation_params.args]
    sys.stderr.write(
        "conftest: jax pre-imported by sitecustomize — re-exec'ing pytest with "
        f"a scrubbed env ({' '.join(f'{k}={v}' for k, v in _SCRUBBED_ENV.items())})\n"
    )
    sys.stderr.flush()
    os.execve(sys.executable, argv, env)
