"""Test configuration: force an 8-virtual-device CPU mesh so tests are
deterministic (fp32, no remote compiles) and sharding/collective tests work
without TPU hardware.

Note: this environment's sitecustomize registers the "axon" TPU PJRT plugin
in every Python process and forcibly sets jax_platforms="axon,cpu",
overriding the JAX_PLATFORMS env var — so the platform must be reset through
jax.config before any backend initialization."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite's wall time is dominated by
# repeated XLA compiles of tiny models — cache across tests and runs
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
