"""Test config: run on a virtual 8-device CPU mesh (SURVEY.md §4 strategy).

The container's sitecustomize imports jax and registers the axon TPU
backend before pytest starts, so env vars are too late — flip the platform
through jax.config before any backend initializes (backends are lazy).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
