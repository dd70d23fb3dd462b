"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before the first `import jax` anywhere in the test session so that
multi-chip sharding tests (tests/test_sharding.py) see 8 devices without TPU
hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
