"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: Tuple[int, ...],
              axis_names: Sequence[str] = ("time", "channels"),
              devices=None) -> Mesh:
    """Build a mesh of the given logical shape over available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names[:len(shape)]))


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A (time, channels) mesh using all (or n) devices: time gets the
    smaller factor (halo exchange is cheap; channel sharding scales the
    matmul), channels the larger."""
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    t = 2 if (n % 2 == 0 and n >= 4) else 1
    return make_mesh((t, n // t), ("time", "channels"), devs[:n])
