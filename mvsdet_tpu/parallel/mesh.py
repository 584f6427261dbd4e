"""Device-mesh construction.

The TPU-native replacement for the reference's DDP/NCCL launcher
(SURVEY §2c): a 2D ``('data', 'view')`` mesh — scenes over the data
axis (the DDP analog), each scene's source views over the view axis
(the sequence-parallel analog; views are the long axis of this
workload, 40-100 per scene).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = 1, view: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'view') mesh over the available devices.

    Args:
      data: scenes processed in parallel per step.
      view: shards of each scene's view axis.
      devices: explicit device list (defaults to jax.devices()).
    """
    devices = list(devices if devices is not None else jax.devices())
    need = data * view
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, view)
    return Mesh(arr, ("data", "view"))
