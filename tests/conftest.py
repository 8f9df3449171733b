"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real multi-chip TPU hardware is not available in CI; sharding correctness is
validated on 8 virtual CPU devices, exactly as the driver's
``dryrun_multichip`` does.

Environment quirk: the container's sitecustomize imports jax at interpreter
start (registering the tunneled-TPU 'axon' backend) and latches
JAX_PLATFORMS=axon from the environment, so env-var overrides in conftest
are too late — the platform and device count must be set through
``jax.config`` (valid until the first backend initialization, which happens
at the first jax operation, after collection).
"""

import os
import sys

# Env fallbacks for interpreters without the sitecustomize hook.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Parity tests compare against SciPy float64; explicit f32 arrays stay f32.
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference datasets not available")
    return REFERENCE_ROOT
