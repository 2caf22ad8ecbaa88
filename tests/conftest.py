"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py and the driver's compile checks.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# The axon sitecustomize registers the TPU plugin whenever
# PALLAS_AXON_POOL_IPS is set and pins the platform; clear it so tests
# run on the virtual CPU mesh deterministically.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The sitecustomize may have imported and configured jax already (at
# interpreter startup, before this conftest); re-pin the platform.
# XLA_FLAGS is read lazily at backend init, so the 8-device CPU mesh
# still takes effect as long as no jax.devices() call happened yet.
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, "build", "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

from tests.make_data import make_all  # noqa: E402


@pytest.fixture(scope="session")
def datadir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    return make_all(str(d))


@pytest.fixture(scope="session")
def goldendir():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
