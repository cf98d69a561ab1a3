"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware in CI is a single chip; multi-chip sharding paths are
validated on XLA's host-platform virtual devices instead. The environment
forces JAX_PLATFORMS=axon, so we must override via jax.config (env vars
alone are not honored once the axon plugin registers).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
