"""Device mesh construction for multi-chip / multi-host training.

The reference is strictly single-GPU (SURVEY §2, parallelism inventory) —
this axis of the framework is new TPU-first design: scale over cameras
(data axis) and image tiles (tile axis) with jax.sharding + collectives over
ICI, jax.distributed for multi-host.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",)) -> Mesh:
    """1D (data) or 2D (data, tile) mesh over the first n devices."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    devs = np.array(devs[:n])
    if len(axes) == 1:
        return Mesh(devs.reshape(n), tuple(axes))
    if len(axes) == 2:
        # favor the data axis; tile axis gets the remainder
        for d in range(int(np.sqrt(n)), 0, -1):
            if n % d == 0:
                break
        return Mesh(devs.reshape(n // d, d), tuple(axes))
    raise ValueError(f"unsupported axes {axes}")


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
