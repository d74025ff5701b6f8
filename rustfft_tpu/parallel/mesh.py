"""Mesh construction helpers."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "fft"),
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices.

    With no axis_sizes, all devices go on the first axis (batch sharding) and
    the remaining axes get size 1.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"axis_sizes {axis_sizes} does not match {n} devices")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, tuple(axis_names))


def split_devices_2d(n_devices: int) -> Tuple[int, int]:
    """Factor n_devices into a near-square (data, fft) grid."""
    best = (n_devices, 1)
    for d in range(1, int(np.sqrt(n_devices)) + 1):
        if n_devices % d == 0:
            best = (n_devices // d, d)
    return best
