"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding is validated on host CPU devices
(SURVEY.md §4: "multi-host tests via jax local mesh simulation") — the real
TPU is reserved for bench runs.

NOTE: this host's sitecustomize imports jax at interpreter start (axon TPU
plugin), so env vars set here are too late for jax's config latch —
``jax.config.update`` must be used for the platform, and XLA_FLAGS set
before the first backend initialization for the device count.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
