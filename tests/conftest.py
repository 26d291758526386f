"""Test configuration: force a virtual 8-device CPU mesh before JAX import.

Real-TPU execution is exercised by bench.py / the driver; unit and parity
tests run on CPU so the sharding paths (shard_map over a Mesh) are testable
without hardware (multi-chip TPU is not available in this environment).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
