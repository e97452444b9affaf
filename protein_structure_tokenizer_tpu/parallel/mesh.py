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


def make_hybrid_mesh(
    axis_name: str, n: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Mesh(("data", axis_name)) with the trailing axis of size ``n``.

    The trailing axis varies fastest in device order — adjacent chips on a
    real slice — so the model/pipe/ctx collectives ride the shortest ICI
    hops.  Shared builder for parallel/{tp,pp,cp}.py.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) % n:
        raise ValueError(f"{len(devices)} devices not divisible by {axis_name}={n}")
    grid = np.asarray(devices).reshape(len(devices) // n, n)
    return Mesh(grid, (DATA_AXIS, axis_name))


def has_axis(mesh: Optional[Mesh], axis_name: str) -> bool:
    return (
        mesh is not None
        and axis_name in mesh.axis_names
        and mesh.shape[axis_name] > 1
    )


def constrain(x: jax.Array, mesh: Optional[Mesh], spec: P, axis_name: str) -> jax.Array:
    """Sharding hint that degrades to a no-op without a >1 ``axis_name`` axis."""
    if not has_axis(mesh, axis_name):
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def single_device(mesh: Optional[Mesh]) -> bool:
    """True when arrays under this mesh live whole on one device — Pallas
    kernels (no GSPMD partitioning rules) are safe exactly then."""
    return mesh is None or mesh.size == 1


def shard_map_compat(f, mesh: Mesh, in_specs, out_specs):
    """jax.shard_map with replication checking off, across the
    check_rep/check_vma API rename (jax>=0.4.30 support range)."""
    import inspect

    kw = (
        "check_vma"
        if "check_vma" in inspect.signature(jax.shard_map).parameters
        else "check_rep"
    )
    return jax.shard_map(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **{kw: False}
    )


def data_shard_map(f, mesh: Mesh, n_batch_args: int):
    """SPMD-over-"data" wrapper for row-independent model fns
    ``f(params, *batch_args)``: params replicated, every batch arg (pytree)
    row-sharded over the data axis.  shard_map requires the leading axis to
    divide mesh.size, so non-divisible batches are edge-padded with copies
    of their last row and the outputs sliced back — rows are independent, so
    pad rows cannot perturb real ones."""
    import jax.numpy as jnp

    spec = P(DATA_AXIS)
    mapped = jax.jit(
        shard_map_compat(
            f, mesh, in_specs=(P(),) + (spec,) * n_batch_args, out_specs=spec
        )
    )

    def wrapped(params, *batch_args):
        rows = jax.tree_util.tree_leaves(batch_args[0])[0].shape[0]
        pad = (-rows) % mesh.size
        if pad == 0:
            return mapped(params, *batch_args)
        padded = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])]
            ),
            batch_args,
        )
        out = mapped(params, *padded)
        return jax.tree_util.tree_map(lambda x: x[:rows], out)

    # Expose lower() for callers that pre-compile (bench.py).  lower/compile
    # bypasses the pad-and-slice wrapper above, so refuse non-divisible
    # batches loudly instead of surfacing an opaque shard_map error.
    def lower(params, *batch_args):
        rows = jax.tree_util.tree_leaves(batch_args[0])[0].shape[0]
        if rows % mesh.size:
            raise ValueError(
                f"data_shard_map.lower: batch rows ({rows}) must divide the "
                f"mesh size ({mesh.size}) — pre-compiled executables bypass "
                "the edge-padding contract; pad the batch or call the "
                "wrapper directly"
            )
        return mapped.lower(params, *batch_args)

    wrapped.lower = lower
    return wrapped


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

    Derived from the batch sharding itself, so it is correct on 2-D meshes
    too (context/pipeline parallel: devices along the non-"data" axis
    replicate rows, so a host's devices may collectively own more than
    1/num_processes of the batch).  The rows a host owns must be contiguous
    (true for the jax.devices() process-contiguous default order).
    """
    index_map = batch_sharding(mesh).addressable_devices_indices_map(
        (global_batch,)
    )
    blocks = sorted(
        {
            (
                idx[0].start or 0,
                global_batch if idx[0].stop is None else idx[0].stop,
            )
            for idx in index_map.values()
        }
    )
    start, stop = blocks[0][0], blocks[-1][1]
    if sum(t - s for s, t in blocks) != stop - start:
        raise ValueError(
            "this process's batch rows are not contiguous under the mesh "
            "layout; feed the batch globally instead of per-host"
        )
    return slice(start, stop)
