"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices; the real-TPU
path is exercised by bench.py / __graft_entry__.py.

Note: this environment's TPU plugin (sitecustomize) calls
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter startup, so
setting JAX_PLATFORMS in the environment is not enough — we must update the
jax config after import, before any backend client is created.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.device_count()}"
