"""Test session setup: force an 8-device virtual CPU mesh before jax import.

The ambient environment pins JAX_PLATFORMS=axon (an exclusive single-TPU
tunnel); tests MUST override it — a test run holding the tunnel blocks every
other JAX process on the machine. Multi-chip sharding is validated here on
host-platform virtual devices; real-TPU behaviour is exercised by bench.py /
__graft_entry__.py under the driver.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
