"""Test env: force CPU backend with a virtual 8-device mesh.

Note: this container's sitecustomize imports jax at interpreter startup
(PYTHONPATH=/root/.axon_site) with JAX_PLATFORMS=axon pinned, so env vars
set here are too late for platform selection — use jax.config.update
instead, which takes effect at (lazy) backend initialization. XLA_FLAGS is
still read at backend init, so the host-device-count flag works from here.

SURVEY §4 implication (d): multi-chip tests run on a faked 8-device mesh
via --xla_force_host_platform_device_count.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the fast tier is compile-dominated (hundreds
# of tiny jit programs); keyed by HLO hash so code changes invalidate
# exactly the programs they touch. Cold tier ~10 min, warm ~x2 faster.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("VAST_TEST_JAX_CACHE",
                                 "/tmp/vast_test_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def pytest_configure(config):
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8, jax.devices()
