"""Test config: force a virtual 8-device CPU mesh before JAX initialises.

Multi-chip sharding (pjit / shard_map over a Mesh) is validated on a faked
8-device CPU host, per the multi-host test strategy in SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
