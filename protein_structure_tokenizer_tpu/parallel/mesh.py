"""Device mesh + sharding utilities (jit/NamedSharding, not pmap).

The distribution model (SURVEY.md §5.8, TPU-native): one
``jax.sharding.Mesh`` over every chip with a single ``"data"`` axis; batches
are sharded along it, parameters replicated on every chip, and cross-shard
statistics (codebook usage) reduce automatically under jit's global-view
semantics — collectives ride ICI within a slice and DCN across slices.
Multi-host initialization goes through ``jax.distributed.initialize``.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up.  No-op for single-process runs.

    Honors the standard JAX env vars when arguments are omitted; safe to call
    unconditionally at program start.
    """
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if explicit is None:
        return
    jax.distributed.initialize(
        coordinator_address=explicit,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A 1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batched arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device_put a host pytree with its leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch_from_local(mesh: Mesh, tree, global_batch: int):
    """Assemble a globally-sharded batch from *process-local* rows.

    Multi-host input pipeline: each host featurizes only its own
    ``process_local_slice`` of the global batch (the reference featurizes the
    full batch on every host, inference_runner.py:288-301) and contributes its
    rows directly to the sharded global array — no cross-host data transfer,
    no redundant host work.  Single-process runs degrade to ``shard_batch``.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, tree)
    sharding = batch_sharding(mesh)

    def to_global(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=(global_batch,) + x.shape[1:]
        )

    return jax.tree_util.tree_map(to_global, tree)


def replicate(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def local_rows(arr) -> np.ndarray:
    """This host's contiguous rows of a batch-sharded array, in batch order.

    The inverse of :func:`shard_batch_from_local` for result fetching: every
    host gets exactly the rows its own devices hold (all rows in
    single-process runs), without a cross-host gather.
    """
    shards = sorted(
        arr.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    seen, parts = set(), []
    for s in shards:  # replicated-per-device arrays repeat indices; dedupe
        key = s.index[0].start or 0
        if key not in seen:
            seen.add(key)
            parts.append(np.asarray(s.data))
    return np.concatenate(parts, axis=0)


def global_batch_size(mesh: Mesh, per_device: int) -> int:
    """Rows per step: per_device x the batch-sharded axis size.

    On a 1-D mesh that is every device; on 2-D meshes (context/pipeline
    parallel) only the "data" axis carries batch rows."""
    if DATA_AXIS in mesh.axis_names:
        return per_device * mesh.shape[DATA_AXIS]
    return per_device * mesh.devices.size


def process_local_slice(mesh: Mesh, global_batch: int) -> slice:
    """The [start, stop) rows of the global batch this host must feed.

    With a 1-D mesh laid out process-contiguously (the jax.devices() default),
    each host owns an equal contiguous span of the batch.
    """
    num_procs = jax.process_count()
    per_proc = global_batch // num_procs
    start = jax.process_index() * per_proc
    return slice(start, start + per_proc)
