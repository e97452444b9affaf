"""Pallas TPU row-gather: in-register one-hot matmul, bit-exact f32.

The encoder's sender gathers — (B, N, D) node tables indexed by the (B, E)
kNN sender list, E = N*K — are the dominant cost of the tokenize forward.
Neither standard lowering is good on TPU:

  * ``jnp.take_along_axis`` lowers to a scalar-core gather (~28 ms at
    B=64/N=512/D=128/E=25.6k on v5e — ~0.5 GB/s effective);
  * a PREBUILT one-hot matmul (models/gnn.py fast path) runs on the MXU but
    materializes a (B, E, N) bf16 matrix: 1.7 GB of HBM that every gather
    re-reads.

This kernel keeps the MXU formulation but synthesizes the one-hot tile
IN REGISTER (compare the index column against an iota — the same trick the
FSQ kernel uses for its implicit codebook, ops/fsq_kernels.py), so HBM
traffic is just the node table + indices + output.

Exactness: the one-hot is exact in bf16 (0.0/1.0), and the f32 node table is
split into three bf16 components (hi/mid/lo — 8 mantissa bits each covers
f32's 24) contracted in three MXU passes with f32 accumulation.  Selecting
one row per output row therefore reconstructs the f32 value bit-for-bit
(verified against take_along_axis in tests/test_ops.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gather_kernel(n_nodes: int, e_tile: int, idx_ref, nodes_ref, out_ref):
    idx = idx_ref[0, 0]  # (E_TILE, 1) int32
    onehot = (
        idx == jax.lax.broadcasted_iota(jnp.int32, (e_tile, n_nodes), 1)
    ).astype(jnp.bfloat16)
    x = nodes_ref[0]  # (N, D) f32
    hi = x.astype(jnp.bfloat16)
    rest = x - hi.astype(jnp.float32)
    mid = rest.astype(jnp.bfloat16)
    lo = (rest - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jax.lax.dot(onehot, hi, preferred_element_type=jnp.float32)
    acc += jax.lax.dot(onehot, mid, preferred_element_type=jnp.float32)
    acc += jax.lax.dot(onehot, lo, preferred_element_type=jnp.float32)
    out_ref[0] = acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_rows_vjp(nodes, idx, e_tile=2048, interpret=None):
    """Differentiable wrapper: forward is the bit-exact kernel, backward the
    textbook scatter-add (grad of a gather), so the exact conformance path can
    use the kernel inside ``jax.grad`` (training with --exact)."""
    return gather_rows(nodes, idx, e_tile=e_tile, interpret=interpret)


def _gather_rows_fwd(nodes, idx, e_tile, interpret):
    return gather_rows(nodes, idx, e_tile=e_tile, interpret=interpret), (
        idx,
        nodes.shape,
    )


def _gather_rows_bwd(e_tile, interpret, res, g):
    idx, nodes_shape = res
    dnodes = jnp.zeros(nodes_shape, g.dtype)
    dnodes = jax.vmap(lambda d, i, gg: d.at[i].add(gg))(dnodes, idx, g)
    return dnodes, None


gather_rows_vjp.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@functools.partial(jax.jit, static_argnames=("e_tile", "interpret"))
def gather_rows(
    nodes: jax.Array,  # (B, N, D) float32
    idx: jax.Array,  # (B, E) int32 in [0, N)
    *,
    e_tile: int = 2048,
    interpret: bool | None = None,
) -> jax.Array:  # (B, E, D) float32, == take_along_axis(nodes, idx[...,None], 1)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, d = nodes.shape
    e = idx.shape[1]
    n_tiles = -(-e // e_tile)
    e_pad = n_tiles * e_tile
    idx4 = jnp.pad(idx, ((0, 0), (0, e_pad - e))).reshape(b, n_tiles, e_tile, 1)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, n, e_tile),
        grid=(b, n_tiles),
        in_specs=[
            # (E_TILE, 1): the trailing singleton satisfies the (8, 128)
            # block-tiling rule ("equal to the respective dimension"), and
            # the column layout broadcasts against the iota without any
            # vector reshape (Mosaic cannot shape-cast (1,1,8,256)->(2048,1)).
            pl.BlockSpec((1, 1, e_tile, 1), lambda i, j: (i, j, 0, 0)),
            # Same node block for every j: Mosaic skips the re-fetch when the
            # block index is unchanged between consecutive grid steps.
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, e_tile, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, e_pad, d), jnp.float32),
        interpret=interpret,
    )(idx4, nodes)
    return out[:, :e]
