import os

# Run the test-suite on a virtual 8-device CPU mesh: numerics need f64 and
# the multi-chip sharding paths are validated without real TPU hardware.
#
# NOTE: this container's sitecustomize imports jax and pins JAX_PLATFORMS=axon
# (remote TPU tunnel) before conftest runs, so the env var alone is ignored —
# the platform must be forced through jax.config before any backend
# initialisation.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: the suite is dominated by XLA compiles of the
# bucketed engine programs, whose shapes recur across runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
