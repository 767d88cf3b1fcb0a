"""Test config: force JAX onto the CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4.3).

Must run before jax is imported anywhere in the test process.
"""

import os

# Force CPU even though the session env pins JAX_PLATFORMS=axon (the TPU
# tunnel): unit tests must be hardware-independent and fast to compile.
# A sitecustomize boot hook prepends "axon" to jax_platforms at import time,
# so the env var alone is not enough -- override the config after import too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: expensive tier (cold-compile CLIs, large parity sweeps); "
        "skipped unless RUN_SLOW=1 so the default suite stays fast on the "
        "1-CPU box",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier; set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


def cpu_subprocess_env(**extra):
    """Env for subprocess-spawning tests: force the CPU backend AND disable
    the axon sitecustomize boot hook (PALLAS_AXON_POOL_IPS gates it) so a
    down TPU tunnel cannot hang hardware-independent subprocess tests."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", **extra)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env
