"""Device mesh + sharding helpers: the framework's entire distributed layer.

The reference uses three mechanisms that are all plain data parallelism
(SURVEY.md §2.3): torch DataParallel (train_sim2real.py:225),
DDP over NCCL (train_depthnet.py:44-49,143-146), and HF Accelerate
(train_full.py:20-23). On TPU all three collapse into ONE concept: a
1-D `Mesh(devices, ('data',))` with the batch dimension sharded and
parameters replicated. Gradient all-reduce, loss gathering and barriers
(dist.all_reduce/barrier/accelerator.gather call sites,
train_depthnet.py:350-387, train_full.py:97-126) become XLA collectives
that pjit inserts automatically from these sharding annotations — they
ride ICI, no NCCL, no process groups, no wrapper classes.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
same annotations then span hosts (DCN between slices). Rank-0 gating maps
to `is_main_process()`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (for params / opt state / scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays with the batch axis sharded.

    Equivalent of DistributedSampler + per-rank loaders
    (train_depthnet.py:83-97): one global batch, split over devices.

    Multi-host: each process holds only its slice of the global batch
    (data.loader.DataLoader slices indices by process); the slices are
    assembled into one global jax.Array via
    make_array_from_process_local_data — addressable shards come from
    local memory, nothing crosses DCN for input loading.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def is_main_process() -> bool:
    """Rank-0 gating (ref `dist.get_rank()==0` / `is_main_process`)."""
    return jax.process_index() == 0
