"""Test configuration: force CPU with 8 virtual devices so (a) parity tests
get exact f32 matmuls and (b) multi-chip sharding tests run without TPU
hardware (the JAX-native fake-multi-node mechanism; see SURVEY.md §4e).

Note: the session's sitecustomize pre-imports jax and pins the 'axon' TPU
platform, so the env-var route (JAX_PLATFORMS=cpu) is too late — override
through jax.config before any backend is touched.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
