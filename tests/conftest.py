"""Test configuration: run on CPU with a fake 8-device mesh (SURVEY.md §4.2).

Unit/property/integration tests run on CPU for speed and determinism; the
multi-device sharding path is exercised via XLA's host-platform device-count
flag.  TPU parity tests opt in with the ``tpu`` marker and a real chip.
"""
import os

# Force, don't setdefault: the shell environment here exports
# JAX_PLATFORMS=axon, which would silently route the whole suite to the
# real chip (and collide with concurrent TPU jobs through the tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU chip")
    config.addinivalue_line("markers", "slow: long-running integration test")
