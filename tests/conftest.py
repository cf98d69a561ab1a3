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

# Persistent XLA compilation cache: the suite is compile-bound (the
# unrolled-Cholesky BA solver alone is a ~45 s compile), and most test
# programs recur run to run. The first run on a machine pays full
# compiles; warm runs load from the cache (measured ~3.7x on the BA
# solver). The directory is keyed by a host-CPU fingerprint: XLA's
# cache key ignores CPU features, so a cache warmed on different
# silicon gets LOADED with mismatched machine features (observed:
# "could lead to execution errors such as SIGILL" warnings and
# mid-suite segfaults after a VM host migration) — see io/cache.py.
from splslam_tpu.io.cache import host_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SPLSLAM_TEST_CACHE",
                                 host_cache_dir("/tmp/splslam_test_xla_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
