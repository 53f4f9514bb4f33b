"""Device mesh and sharding helpers.

The reference is single-GPU (trainer/base.py:27 pins cuda:0); scaling here
is native: a 1-D "data" mesh shards the batch dimension of every array in
the step, parameters/optimizer state are replicated, and XLA inserts the
gradient/BN psums over ICI. Loss normalizers (the global `num_valid`
sums) are ordinary reductions over sharded arrays, so they become global
psums automatically under jit — no hand-written collectives needed.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place every leaf of a batch pytree with its leading dim sharded over
    the mesh's data axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
