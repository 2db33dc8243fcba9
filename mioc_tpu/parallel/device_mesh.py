"""Device-mesh helpers.

The reference has no parallelism of any kind (SURVEY.md §2, grep-verified);
all distributed components here are greenfield TPU-native design: one
``jax.sharding.Mesh`` whose axes carry

  * ``batch``  — scenario/multistart data parallelism (instances, restarts),
  * ``level``  — partition of the DP's successor-combination contraction axis
    (the analogue of tensor parallelism for the min-plus matmul),

with XLA collectives over ICI (``pmin``/``all_gather``) and
``jax.distributed`` + DCN for multi-host scale-out.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_device_mesh"]


def make_device_mesh(batch: int = None, level: int = 1, devices=None) -> Mesh:
    """Create a ``(batch, level)`` mesh over ``devices`` (default: all local).

    ``batch=None`` uses all remaining devices on the batch axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if batch is None:
        if n % level:
            raise ValueError(f"{n} devices not divisible by level={level}")
        batch = n // level
    if batch * level > n:
        raise ValueError(f"mesh {batch}x{level} exceeds {n} devices")
    arr = np.array(devices[: batch * level]).reshape(batch, level)
    return Mesh(arr, axis_names=("batch", "level"))
