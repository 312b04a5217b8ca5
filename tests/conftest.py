"""Test env: force JAX onto CPU with 8 virtual devices.

This is the TPU-native analog of multi-node testing without a cluster
(SURVEY.md §4): mesh-sharded code paths (tensor/data parallel) run on an
8-way host mesh, so every sharding/collective is exercised in CI.

Must run before jax initializes its backends, hence module-level in
conftest.
"""

import os

# force (not setdefault): the driver environment pins JAX_PLATFORMS to the
# TPU plugin, but the suite must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("OMP_NUM_THREADS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Env vars alone are insufficient here: the TPU plugin environment pins
# JAX_PLATFORMS before pytest starts, and config wins over late env edits.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    # two tiers on this 1-core box (CLAUDE.md): the default full suite, and
    # a fast iteration tier via `-m "not slow"` (slow = oracle-parity /
    # multi-step / CLI end-to-end tests)
    config.addinivalue_line(
        "markers", "slow: oracle-parity / multi-step tests (skip with -m 'not slow')")


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual cpu devices, got {devs}"
    return devs[:8]
