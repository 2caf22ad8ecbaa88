"""Test configuration: a virtual 8-device CPU mesh by default.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count). Set SPSP_TEST_PLATFORM=tpu to
run the suite on the real chip instead (enables the TPU-gated tests,
e.g. the compiled Mosaic walker in test_walker.py and the smoke set in
test_tpu_smoke.py).
"""

import os
import sys

_PLATFORM = os.environ.get("SPSP_TEST_PLATFORM", "cpu")

if _PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The axon sitecustomize registers the TPU plugin whenever
    # PALLAS_AXON_POOL_IPS is set and pins the platform; clear it so
    # tests run on the virtual CPU mesh deterministically.
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
# any other value: leave the environment alone — the platform the
# interpreter booted with (e.g. the axon TPU plugin) stays active.
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
