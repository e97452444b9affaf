"""Pallas TPU kernels for the MPNN message-passing hot path.

The encoder GNN dominates tokenize device time (~35 ms of ~37 ms for a 32x512
CASP14 batch): each of the 3 layers makes ~10 full passes over the
(B, N*K, 128) edge table through XLA (matmul -> gelu -> matmul -> reduce /
residual -> masked-LN).  These kernels fuse the two trailing MLP layers with
the consumer (K-axis aggregation for the node path; residual + masked
layer-norm for the edge path) so each edge-table element is read once and the
intermediates never touch HBM.

Numerics: identical op sequence and per-row reduction order as the jnp fast
path (models/gnn.py); f32 throughout.  Token-id parity vs the reference is
asserted by tests/test_model_parity.py with the kernels enabled.

Layout contract: edge tables arrive flattened as (B*N*K, D) rows with K
consecutive rows per node (the canonical receiver order the featurizer
guarantees).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mlp_tail(x, w1_ref, b1_ref, w2_ref, b2_ref):
    """act(x) @ W1 + b1 -> act -> @ W2 + b2 (the two trailing MLP layers)."""
    h = jax.nn.gelu(x)
    h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h = jax.nn.gelu(h)
    return jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]


def _node_kernel(h0_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, tile_n, k):
    msg = _mlp_tail(h0_ref[:], w1_ref, b1_ref, w2_ref, b2_ref)
    d = msg.shape[-1]
    out_ref[:] = msg.reshape(tile_n, k, d).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def fused_message_aggregate(
    h0: jax.Array,  # (R, D) pre-activation rows, R = B*N*K
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    k: int,
    tile_n: int = 16,
    interpret: bool | None = None,
) -> jax.Array:
    """MLP tail + sum over each node's K neighbor rows -> (R // K, D)."""
    rows, d = h0.shape
    n = rows // k
    while n % tile_n:
        tile_n //= 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_node_kernel, tile_n=tile_n, k=k)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n * k, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
    )(h0, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))


def _edge_kernel(
    h0_ref, edge_ref, mask_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    scale_ref, offset_ref, out_ref, *, eps,
):
    msg = _mlp_tail(h0_ref[:], w1_ref, b1_ref, w2_ref, b2_ref)
    x = edge_ref[:] + msg
    # Masked layer-norm with the reference's exact quirk (gnn_layers.py:
    # 108-164): pre-mask the input, mask again inside the mean, divide by the
    # full channel count.  The mask is constant per edge row.
    m = mask_ref[:]  # (rows, 1)
    x = m * x
    mean = jnp.mean(m * x, axis=-1, keepdims=True)
    var = jnp.mean(m * jnp.square(x - mean), axis=-1, keepdims=True)
    inv = scale_ref[:] * jax.lax.rsqrt(var + eps)
    out_ref[:] = inv * (x - mean) + offset_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_r", "eps", "interpret"))
def fused_edge_update(
    h0: jax.Array,  # (R, D) pre-activation message rows
    edge_in: jax.Array,  # (R, D) residual input
    row_mask: jax.Array,  # (R, 1) node validity per edge row
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    ln_scale: jax.Array,
    ln_offset: jax.Array,
    *,
    tile_r: int = 1024,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jax.Array:
    """MLP tail + residual + masked layer-norm over edge rows -> (R, D)."""
    rows, d = h0.shape
    while rows % tile_r:
        tile_r //= 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_edge_kernel, eps=eps)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(rows // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), jnp.float32),
    )(
        h0,
        edge_in,
        row_mask,
        w1,
        b1.reshape(1, -1),
        w2,
        b2.reshape(1, -1),
        ln_scale.reshape(1, -1),
        ln_offset.reshape(1, -1),
    )
