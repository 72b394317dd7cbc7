"""Device mesh construction helpers.

Axis conventions used across the framework:
  * "data"  — batch / index-shard axis (pure data parallel; collectives are
              all-gathers of small top-k tuples, so this axis can ride DCN)
  * "model" — tensor-parallel axis for generator params (attention heads,
              MLP hidden) — keep on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n != len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def default_mesh(data_parallel: Optional[int] = None) -> Mesh:
    """All devices on the data axis (the retrieval-index layout)."""
    devices = jax.devices()
    dp = data_parallel or len(devices)
    return create_mesh((dp, len(devices) // dp), ("data", "model"))
