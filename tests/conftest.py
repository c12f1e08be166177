"""Test configuration: run on a virtual 8-device CPU mesh.

Sharding/vmap equivalence tests need multiple CPU devices; the driver
validates the real-TPU path separately.

In environments where a sitecustomize pre-imports JAX bound to a TPU
backend (e.g. the axon tunnel) before this conftest runs, env vars alone
cannot switch the platform anymore — so we re-exec the test process once
with a clean environment (guarded against loops by _SBAYES_TPU_TEST_REEXEC).
"""
import os
import sys

_MARKER = "_SBAYES_TPU_TEST_REEXEC"


def _jax_bound_to_non_cpu() -> bool:
    if "jax" not in sys.modules:
        return False
    # A TPU-plugin sitecustomize typically pre-imports jax and pins the
    # platform; honor an explicit cpu setting, otherwise re-exec.
    return os.environ.get("JAX_PLATFORMS", "") not in ("cpu",) or bool(
        os.environ.get("PALLAS_AXON_POOL_IPS")
    )


if os.environ.get(_MARKER) != "1" and _jax_bound_to_non_cpu():
    env = dict(os.environ)
    env[_MARKER] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # don't dial the TPU tunnel for unit tests
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compilation cache: repeat test runs skip XLA compilation.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
