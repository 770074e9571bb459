"""Device mesh construction."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    shape: tuple[int, ...] | None = None,
    axis_names: tuple[str, ...] = ("dp", "tp"),
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices.

    Args:
      shape: per-axis sizes; None puts all devices on the first axis.
      axis_names: mesh axis names, default ("dp", "tp").

    Returns:
      jax.sharding.Mesh.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)
