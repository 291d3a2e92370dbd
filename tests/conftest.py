"""Test config: run on a virtual 8-device CPU mesh (SURVEY.md §4 strategy).

The container's sitecustomize imports jax and registers the axon TPU
backend before pytest starts, so env vars are too late — flip the platform
through jax.config before any backend initializes (backends are lazy).

`pytest -m tpu` (with GM_TPU=1) runs the compiled-kernel suite on the real
chip instead: tests marked `tpu` auto-skip on CPU, everything else
auto-skips when GM_TPU=1, so the two worlds never share a process.
"""

import os

import pytest

ON_TPU = os.environ.get("GM_TPU") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not ON_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(reason="needs GM_TPU=1 + a TPU backend")
    skip_cpu = pytest.mark.skip(reason="CPU-mesh test; GM_TPU=1 run is TPU-only")
    for item in items:
        if "tpu" in item.keywords:
            if not ON_TPU:
                item.add_marker(skip_tpu)
        elif ON_TPU:
            item.add_marker(skip_cpu)
