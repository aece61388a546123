"""Device mesh helpers.

The merge pipeline uses a 1-D mesh axis ("x") to shard single large tensors
for the distributed FFT blend (parallel/fft2d.py, SURVEY.md §2.3); model
training/inference uses a 2-D ("dp", "tp") mesh (parallel/train.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "mesh_shape_for"]


def mesh_shape_for(n: int, n_axes: int) -> Tuple[int, ...]:
    """Split ``n`` devices into ``n_axes`` factors, largest last (the last
    axis is the model/tensor axis, which profits most from being wide)."""
    if n_axes == 1:
        return (n,)
    shape = [1] * n_axes
    remaining = n
    # greedily peel the smallest prime factor onto the leading axes
    for i in range(n_axes - 1):
        for p in (2, 3, 5, 7):
            if remaining % p == 0 and remaining // p >= 1:
                shape[i] = p
                remaining //= p
                break
    shape[-1] = remaining
    # normalize: product must be n
    if int(np.prod(shape)) != n:
        shape = [1] * (n_axes - 1) + [n]
    return tuple(shape)


def make_mesh(
    axis_names: Sequence[str] = ("x",),
    devices: Optional[Sequence] = None,
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a Mesh over the available devices.

    With one axis name all devices go on that axis; with more, ``shape``
    (or a heuristic split) divides them.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else mesh_shape_for(n, len(axis_names))
    if int(np.prod(shape)) != n:
        raise ValueError(f"Mesh shape {shape} does not cover {n} devices")
    device_array = np.asarray(devices).reshape(shape)
    return Mesh(device_array, axis_names=tuple(axis_names))
