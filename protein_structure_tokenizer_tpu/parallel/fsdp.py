"""Fully-sharded data parallelism (ZeRO-3 style) over the 1-D ``data`` mesh.

The reference trains nothing and replicates all parameters under pmap
(/root/reference/scripts/inference_runner.py:236-248); this framework's
trainers default to the same replicated layout (runtime/train_lm.py).  FSDP
is the TPU-native memory-scaling alternative: every parameter AND its Adam
moments are sharded across the ``data`` axis, so per-chip state memory is
``O(params / n_chips)`` instead of ``O(params)``.

There is no hand-written communication here — this is the GSPMD recipe from
the scaling playbook: place each leaf with a ``NamedSharding`` that splits
its largest divisible axis over ``data``, keep the batch data-sharded, and
jit the ordinary train step with matching in/out shardings.  XLA inserts the
all-gather of each weight right before its matmul (forward and backward) and
a reduce-scatter of its gradient, both riding ICI; donation keeps the update
in-place.  Numerics are identical to plain data parallelism — pinned by
tests/test_fsdp.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib

# Leaves smaller than this stay replicated: sharding tiny vectors (LN scales,
# biases) saves no memory and costs an all-gather dispatch each.
MIN_SHARD_ELEMS = 2 ** 14


def leaf_spec(shape, axis_size: int, *, min_shard_elems: int = MIN_SHARD_ELEMS) -> P:
    """PartitionSpec sharding the largest dim divisible by ``axis_size``.

    Prefers the largest dimension (most even memory split); replicates
    scalars, small leaves, and shapes with no divisible dimension.
    """
    size = int(np.prod(shape)) if shape else 1
    if size < min_shard_elems:
        return P()
    for d in sorted(range(len(shape)), key=lambda i: shape[i], reverse=True):
        if shape[d] % axis_size == 0:
            return P(*[mesh_lib.DATA_AXIS if i == d else None for i in range(len(shape))])
    return P()


def fsdp_shardings(mesh: Mesh, tree, *, min_shard_elems: int = MIN_SHARD_ELEMS):
    """Pytree of NamedShardings mirroring ``tree`` (arrays or ShapeDtypeStructs)."""
    axis_size = mesh.shape[mesh_lib.DATA_AXIS]

    def one(x):
        return NamedSharding(
            mesh, leaf_spec(tuple(x.shape), axis_size, min_shard_elems=min_shard_elems)
        )

    return jax.tree.map(one, tree)


def shard_tree(mesh: Mesh, tree, *, min_shard_elems: int = MIN_SHARD_ELEMS):
    """Place every leaf with its FSDP sharding."""
    return jax.device_put(tree, fsdp_shardings(mesh, tree, min_shard_elems=min_shard_elems))


def num_sharded_leaves(tree) -> int:
    """How many leaves actually carry a sharded (non-replicated) layout."""
    count = 0
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array) and any(
            s is not None for s in leaf.sharding.spec
        ):
            count += 1
    return count
