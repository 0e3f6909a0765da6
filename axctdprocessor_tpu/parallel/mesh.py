"""Device mesh construction and sharding helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a named mesh, e.g. make_mesh({"dp": 4, "sp": 2}).

    Defaults to all available devices on a single "dp" axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {"dp": len(devices)}
    names = tuple(shape.keys())
    dims = tuple(shape.values())
    total = int(np.prod(dims))
    if total > len(devices):
        raise ValueError(f"mesh {shape} needs {total} devices, have {len(devices)}")
    arr = np.array(devices[:total]).reshape(dims)
    return Mesh(arr, names)


def shard_over(mesh: Mesh, *axis_per_dim) -> NamedSharding:
    """NamedSharding with the given axis name (or None) per array dim."""
    return NamedSharding(mesh, P(*axis_per_dim))
