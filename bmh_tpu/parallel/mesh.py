"""Mesh helpers: the block axis is the codec's one natural parallel axis.

The reference has no parallelism at all (SURVEY §2.4); here every block is
independent (own BWT shift, own Huffman table in its header), so data
parallelism over blocks rides a 1-D device mesh — ICI within a slice, DCN
across hosts — with XLA collectives for the ordered compressed-block gather.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

BLOCK_AXIS = "blocks"


def make_mesh(n_devices: int | None = None, axis_name: str = BLOCK_AXIS,
              local: bool = False) -> Mesh:
    """local=True builds the mesh from THIS PROCESS's devices — the
    per-process dispatch pattern JaxBackend shard_maps over (each process
    shards its own block stripe; multi-host coordination happens at the
    parallel/distributed.py layer, not inside a compress dispatch).  A
    global-device mesh there would make every dispatch a cross-host
    collective program whose outputs no single host can pull."""
    devs = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def block_sharding(mesh: Mesh, axis_name: str = BLOCK_AXIS) -> NamedSharding:
    """Shard the leading (block-batch) dimension across the mesh (used to
    pre-place dryrun/test batches so the sharded step starts from
    device-resident shards rather than host replicas)."""
    return NamedSharding(mesh, PartitionSpec(axis_name))
