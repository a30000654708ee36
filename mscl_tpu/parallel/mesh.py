"""Device mesh + sharding helpers.

TPU-native replacement for the reference's DDP/NCCL distribution
(reference apis/train.py:84-88, dist_train.sh): one data-parallel mesh
axis; the global batch is sharded over it, model/optimizer state is
replicated, and XLA inserts the gradient psums / BN-stat reductions over
ICI. Multi-host extends the same mesh via jax.distributed.initialize —
no launcher scripts, no process groups.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_devices: Optional[int] = None,
                axis_names: Sequence[str] = ('data',)) -> Mesh:
    """1-axis DP mesh over all (or the first N) local devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    assert len(axis_names) == 1, 'MSCL parallelism is DP-only (SURVEY §2.9)'
    return Mesh(np.array(devices), axis_names)


def batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Shard the leading (batch) dim; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = 'data'):
    """Device-put a host batch dict with the leading dim sharded over the
    mesh. Lists (MoCo [q, k] pairs) are sharded element-wise."""
    sharding = batch_sharding(mesh, axis)

    def put(x):
        if isinstance(x, (list, tuple)):
            return type(x)(put(v) for v in x)
        if hasattr(x, 'ndim') and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return x

    return {k: put(v) for k, v in batch.items()
            if not isinstance(v, (str, dict))}
