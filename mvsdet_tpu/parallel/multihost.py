"""Multi-host initialisation and global batch assembly.

TPU-native replacement for the reference's multi-node launcher
(tools/dist_train.sh NNODES/NODE_RANK/MASTER_ADDR + NCCL, SURVEY §2c):
`jax.distributed.initialize` + global-mesh construction where the data
axis spans hosts (DCN) and the view axis stays within a slice (ICI).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialise the multi-host runtime (idempotent single-host no-op).

    With no arguments, follows the standard TPU env (JAX autodetects on
    Cloud TPU); arguments mirror `jax.distributed.initialize`.
    """
    # NB: must not touch jax.process_count()/jax.devices() here — any
    # backend-initialising call makes jax.distributed.initialize raise
    if jax.distributed.is_initialized():
        return  # already initialised
    if coordinator_address is None and num_processes is None:
        env_addr = os.environ.get("MVSDET_COORDINATOR")
        if env_addr is None:
            return  # single host
        coordinator_address = env_addr
        num_processes = int(os.environ.get("MVSDET_NUM_PROCESSES", "1"))
        process_id = int(os.environ.get("MVSDET_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)


def make_global_mesh(data: int, view: int) -> Mesh:
    """('data', 'view') mesh over ALL processes' devices.

    The data axis is laid out across hosts first (gradient all-reduce
    rides DCN between hosts), the view axis within a host's slice
    (feature all_gather / voxel psum ride ICI).
    """
    devices = np.asarray(jax.devices())
    need = data * view
    if devices.size < need:
        raise ValueError(f"need {need} devices, have {devices.size}")
    return Mesh(devices[:need].reshape(data, view), ("data", "view"))


def host_local_batch_to_global(batch: Dict[str, np.ndarray], mesh: Mesh,
                               specs: Dict[str, P]):
    """Assemble a global array batch from per-host local shards.

    Each host feeds the scenes for its own data-axis rows; this wraps
    `jax.make_array_from_process_local_data` per key.
    """
    out = {}
    for k, v in batch.items():
        sharding = NamedSharding(mesh, specs[k])
        out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
