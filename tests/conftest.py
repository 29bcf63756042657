"""Test configuration: run everything on a virtual 8-device CPU mesh, f64.

Multi-chip sharding paths are validated on host CPU devices per the standard
JAX recipe (``--xla_force_host_platform_device_count``); real-TPU execution is
exercised separately by bench.py / the driver.

The session sitecustomize pre-imports jax and registers the tunneled-TPU
"axon" PJRT plugin in every python process, so env vars are too late here:
the platform must be forced through ``jax.config`` (which also prevents the
slow tunnel handshake at backend init).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
