"""Test/dev helpers."""

import os


def force_cpu(num_devices: int = 8) -> None:
    """Pin JAX to the host CPU backend (with `num_devices` virtual devices).

    The dev machines preload jax and register a tunneled-TPU backend in
    sitecustomize, setting ``jax_platforms="axon,cpu"`` via jax.config — which
    overrides the JAX_PLATFORMS env var.  Call this before any jax
    computation to keep scripts/tests off the TPU."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={num_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", num_devices)
