"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on a forced host-platform device
mesh — the standard JAX way to test distribution without real hardware.

Note: this environment's sitecustomize imports JAX at interpreter startup
(registering a TPU plugin), so `JAX_PLATFORMS` in the environment is
already consumed; backend *resolution* is still lazy, so an in-process
`jax.config.update` before the first backend use reliably redirects tests
to the virtual CPU mesh. Set DCRT_TEST_TPU=1 to run the suite on real
devices instead.
"""

import os

if not os.environ.get("DCRT_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    # persistent XLA compile cache: the suite's wall time is dominated
    # by recompiling the same ~100 programs every run (17 min cold vs
    # minutes warm). Keys are content-addressed (computation +
    # jaxlib/platform), so edits invalidate exactly the programs they
    # change. Disable with DCRT_TEST_NO_CACHE=1.
    if not os.environ.get("DCRT_TEST_NO_CACHE"):
        _cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_compile_cache")
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
