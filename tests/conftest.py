"""Test configuration: run everything on a virtual 8-device CPU mesh, f64.

Multi-chip sharding paths are validated on host CPU devices per the standard
JAX recipe (``--xla_force_host_platform_device_count``); real-TPU execution is
exercised separately by bench.py / the driver.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
