"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The dev machines preload jax and register the tunneled-TPU ("axon") backend in
sitecustomize, which sets ``jax_platforms="axon,cpu"`` via jax.config —
overriding the JAX_PLATFORMS env var.  Unit tests must (a) not grab the TPU
and (b) see 8 virtual CPU devices for sharding tests, so we update jax.config
directly before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
