"""Core batched data containers (registered JAX pytrees)."""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in fields), None

    def unflatten(aux, children):
        return cls(**dict(zip(fields, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class ProteinGraphBatch:
    """Padded k-NN residue graph batch.

    Shapes (B = batch, N = padded residues, T = N / downsampling_ratio,
    E = N * K edges):
      n_node:      (B, 1) true residue count
      n_edge:      (B, 1) true edge count
      nodes_mask:  (B, N, 1)
      tokens_mask: (B, T, 1)
      node_features / nodes_original_coordinates: (B, N, 3) residue locations
      edge_features: (B, E, 27) = 15 RBF distance features + 12 frame-projected
        geometry features
      senders/receivers: (B, E) int32; receivers are canonically
        repeat(arange(N), K) for proteins with >= K residues
    """

    n_node: jax.Array
    n_edge: jax.Array
    nodes_mask: jax.Array
    tokens_mask: jax.Array
    nodes_original_coordinates: jax.Array
    node_features: jax.Array
    edge_features: jax.Array
    senders: jax.Array
    receivers: jax.Array


@_register
@dataclasses.dataclass(frozen=True)
class TokenizerBatch:
    """Graph + structure-module ground-truth features (training/full-AE)."""

    graph: ProteinGraphBatch
    features: Dict[str, Any]
