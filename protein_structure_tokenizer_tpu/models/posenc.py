"""Sinusoidal positional encodings.

Replicates the reference's non-standard formula exactly (it interleaves cos at
odd feature indices with sin at even ones and uses ``x*pi`` phases; see
/root/reference/structure_tokenizer/model/positional_encoding_layer.py:49-66),
but computed as one vectorized broadcast instead of nested ``jax.vmap`` over
scalar positions — the whole encoding table is a single (P, D) elementwise op
on the VPU.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def sinusoidal_features(x: jnp.ndarray, num_residues: int, dim: int) -> jnp.ndarray:
    """Positional-encoding features for (possibly negative) positions ``x``.

    Args:
      x: integer or float array of any shape, typically a position index or a
        sender-receiver index difference.
      num_residues: the ``n`` in the formula (sequence length).
      dim: number of feature dimensions ``d``.

    Returns:
      float32 array of shape ``x.shape + (dim,)`` where feature ``k`` (1-based)
      is ``cos(x*pi / n**(2(k-1)/d))`` for odd ``k`` and
      ``sin(x*pi / n**(2k/d))`` for even ``k``.
    """
    k = jnp.arange(1, dim + 1)
    odd = jnp.mod(k, 2)
    x = jnp.asarray(x)[..., None] * math.pi
    cos_term = jnp.cos(x / num_residues ** (2 * (k - 1) / dim))
    sin_term = jnp.sin(x / num_residues ** (2 * k / dim))
    return odd * cos_term - (odd - 1) * sin_term


def node_positional_embeddings(n_node: int, dim: int) -> jnp.ndarray:
    """(n_node, dim) encodings of absolute indices 0..n_node-1."""
    return sinusoidal_features(jnp.arange(n_node), n_node, dim)


def edge_positional_embeddings(
    senders: jnp.ndarray, receivers: jnp.ndarray, n_node: int, dim: int
) -> jnp.ndarray:
    """(E, dim) encodings of sender-receiver index differences."""
    return sinusoidal_features(senders - receivers, n_node, dim)
