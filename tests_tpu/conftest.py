"""On-chip parity tier: runs on the REAL TPU (axon) backend.

Unlike tests/ (which forces an 8-device virtual CPU mesh), this tier
keeps the interpreter's default backend.  Every test skips itself unless
a TPU-class device is actually present, so `pytest tests_tpu/` is safe
anywhere but only asserts on the chip.  Run it alone — only one process
can hold this rig's chip.
"""

import pytest


def on_chip() -> bool:
    try:
        import jax
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if on_chip():
        return
    skip = pytest.mark.skip(reason="no TPU backend (on-chip tier)")
    for item in items:
        item.add_marker(skip)


def pytest_report_header(config):
    try:
        import jax
        return f"on-chip tier backend: {jax.default_backend()}"
    except Exception:
        return "on-chip tier: jax unavailable"
