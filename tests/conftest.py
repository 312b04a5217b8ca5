"""Test env: force JAX onto CPU with 8 virtual devices.

This is the TPU-native analog of multi-node testing without a cluster
(SURVEY.md §4): mesh-sharded code paths (tensor/data parallel) run on an
8-way host mesh, so every sharding/collective is exercised in CI.

Must run before jax initializes its backends, hence module-level in
conftest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual cpu devices, got {devs}"
    return devs[:8]
