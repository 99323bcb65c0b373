"""Test session setup: force an 8-device virtual CPU mesh.

The container's sitecustomize imports jax at interpreter startup and points
it at 'axon' — an exclusive single-TPU tunnel (two concurrent processes
deadlock on it). Setting JAX_PLATFORMS in the environment is therefore too
late; we must retarget via jax.config BEFORE any backend is initialised.
Multi-chip sharding is validated here on 8 virtual host devices; real-TPU
behaviour is exercised by bench.py / __graft_entry__.py under the driver.
"""

import os

# XLA_FLAGS is read when the CPU client is created (later), so this works
# even though jax itself was already imported by sitecustomize.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat suite runs skip XLA compiles (the
# dominant cost on this single-core host; ~23 min cold, far less warm).
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "jax")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
