"""Device-mesh construction for multi-chip execution.

The reference has no distributed runtime (SURVEY.md §2: no DP/TP/PP, no
collectives); on TPU pods parallelism is a first-class feature here: a
("data", "model") mesh where the batch (independent 30-second windows /
audio streams) shards over "data" and attention heads + MLP hidden units
shard over "model".  XLA GSPMD inserts the all-reduces over ICI.
"""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ("data", "model") mesh.

    shape: (data, model) sizes; defaults to all devices on the data axis
    (pure DP), which is the right default for batched 30-second windows.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    n = shape[0] * shape[1]
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(shape)
    return Mesh(grid, axis_names)
