"""Test bootstrap: force an 8-virtual-device CPU mesh.

The environment pins JAX to the 'axon' (TPU tunnel) platform via a
sitecustomize hook; it pre-imports jax but does NOT initialize backends, so
flipping the platform here (before any test touches a device) is safe.
Multi-chip sharding tests run against the 8-device virtual CPU mesh; the
driver separately dry-runs the multi-chip path via __graft_entry__.py.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the prover graphs are large; caching makes
# repeat test runs (and the driver's pytest invocation) much faster.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
