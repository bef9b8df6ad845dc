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
# The axon sitecustomize force-registers the TPU platform at interpreter
# start when this is set; neutralize it and pin the config so the suite can
# never land on the real chip (it would also collide with concurrent TPU
# jobs through the single-client tunnel).
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# CI drift pins are recorded against numpy-generated fixtures; an inherited
# VELO_FIX_ACCEL=1 would silently flip the generator (f32-tolerance-different
# realizations => different chaotic tails) under the pinned thresholds.
os.environ.pop("VELO_FIX_ACCEL", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU chip")
    config.addinivalue_line("markers", "slow: long-running integration test")
