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

# NB: do NOT enable the persistent compilation cache here — on this host the
# XLA:CPU AOT entries record machine features that fail to match at load
# time ("+prefer-no-scatter ... doesn't match"), so every cache hit turns
# into a failed load + recompile, much slower than no cache at all.
