"""Test configuration: force a virtual 8-device CPU mesh before JAX loads.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py and the driver's compile checks.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

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
