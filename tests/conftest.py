"""Test config: force a virtual 8-device CPU mesh before any backend init.

Multi-chip sharding (pjit / shard_map over a Mesh) is validated on a faked
8-device CPU host, per the multi-host test strategy in SURVEY.md §4.

NOTE: the environment's axon TPU plugin overrides JAX_PLATFORMS via
jax.config at import time, so the env var alone is NOT enough — we must call
jax.config.update after importing jax.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running end-to-end test (multi-process CLI runs etc.)",
    )
