"""Pallas TPU kernels: fully-fused MPNN message-passing layers.

The encoder GNN dominates tokenize device time.  The XLA fast path
(models/gnn.py) is HBM-bound: per layer it makes ~5 full passes over the
(B, N*K, 128) edge table (message MLP chain, edge-update MLP chain, masked
LN) plus the materialized (B, N*K, N) bf16 sender one-hot — XLA cost analysis
of the B=64 tokenize executable reports ~42 GB accessed per batch against a
~0.9 GB edge table.

These kernels fuse each layer's entire edge-table pipeline so the table is
read ONCE per kernel and every intermediate lives in VMEM:

  * ``fused_mpnn_node_update``: edge projection + in-register sender one-hot
    gather (iota-compare, no materialized one-hot — the trick proven bit-exact
    in ops/gather_kernels.py) + receiver broadcast + 2-layer gelu MLP tail +
    K-slot aggregation.  One read of the edge table, one (B, N, D) write.
  * ``fused_mpnn_edge_update``: same message pipeline + residual + the
    reference's masked layer-norm quirk (gnn_layers.py:108-164 semantics:
    pre-mask, mask inside the mean, divide by full channel count).  One read +
    one write of the edge table.

Everything runs on flat (TILE_E, D) row tiles — TILE_E = TILE_N * K edge rows,
K consecutive slots per node (the canonical receiver order the featurizer
guarantees for proteins with >= K residues, the inference contract per
inference_runner.py:58-62).  The per-node broadcast (receiver term, node mask)
and the K-slot reduction are tiny iota-built 0/1 matmuls on the MXU, so no
tensor ever carries a ragged K=50 dimension (Mosaic would pad it per tile).

Numerics match the jnp one-hot fast path: matmul operands are truncated to
bf16 with f32 accumulation (the exact semantics of XLA's DEFAULT matmul
precision on TPU, which the jnp path uses), and the sender gather contracts a
bf16 one-hot.  ``exact_gather=True`` switches to full-f32 matmuls and the
bit-exact bf16x3-split gather for tight-equivalence tests.  Token-id parity
vs the reference with the kernels enabled is asserted in
tests/test_model_parity.py; elementwise equivalence in tests/test_ops.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CONTRACT = (((1,), (0,)), ((), ()))


def _dot(a, b, *, bf16_operands):
    """2D MXU contraction with f32 accumulation.

    ``bf16_operands=True`` truncates both operands to bf16 first — the exact
    semantics of XLA's DEFAULT matmul precision on TPU, which the jnp fast
    path uses (jnp.matmul on f32 inputs): one MXU pass instead of the
    multi-pass full-f32 product Mosaic would otherwise emit.
    """
    if bf16_operands:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, _CONTRACT, preferred_element_type=jnp.float32)


def _expand_matrix(tile_n: int, k: int):
    """(TILE_E, TILE_N) bf16 0/1 matrix: row e maps to node e // K."""
    tile_e = tile_n * k
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_e, tile_n), 1)
    return (rows // k == cols).astype(jnp.bfloat16)


def _reduce_matrix(tile_n: int, k: int):
    """(TILE_N, TILE_E) bf16 0/1 matrix summing each node's K slots."""
    tile_e = tile_n * k
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_e), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_e), 1)
    return (rows == cols // k).astype(jnp.bfloat16)


def _message_tail(h0, w1_ref, b1_ref, w2_ref, b2_ref, *, bf16_operands):
    """act(h0) @ W1 + b1 -> act -> @ W2 + b2 over (TILE_E, D) rows."""
    h = jax.nn.gelu(h0)
    h = _dot(h, w1_ref[:], bf16_operands=bf16_operands) + b1_ref[:]
    h = jax.nn.gelu(h)
    return _dot(h, w2_ref[:], bf16_operands=bf16_operands) + b2_ref[:]


def _message_preact(
    edge_ref, idx_ref, sproj_ref, rproj_ref, we_ref, *, n_nodes, k, exact_gather
):
    """h0 = edges @ We + onehot(senders) @ sender_proj + receiver_proj."""
    bf16_operands = not exact_gather
    edges = edge_ref[0]  # (TILE_E, D)
    tile_e = edges.shape[0]
    eproj = _dot(edges, we_ref[:], bf16_operands=bf16_operands)
    idx = idx_ref[0]  # (TILE_E, 1) int32
    onehot = (
        idx == jax.lax.broadcasted_iota(jnp.int32, (tile_e, n_nodes), 1)
    ).astype(jnp.bfloat16)

    def sel(table):
        return jax.lax.dot_general(
            onehot, table, _CONTRACT, preferred_element_type=jnp.float32
        )

    x = sproj_ref[0]
    if exact_gather:
        # bf16x3 operand split: hi/mid/lo bf16 components cover f32's 24
        # mantissa bits, and a one-hot row selection reconstructs the f32
        # value bit-for-bit (same trick as ops/gather_kernels.py).  3x the
        # gather MXU passes — used for the tight-equivalence test path.
        hi = x.astype(jnp.bfloat16)
        rest = x - hi.astype(jnp.float32)
        mid = rest.astype(jnp.bfloat16)
        lo = (rest - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        gathered = sel(hi) + sel(mid) + sel(lo)
    else:
        # Single bf16 pass — identical numerics to the jnp one-hot fast path
        # (XLA's default-precision einsum truncates the f32 operand to bf16).
        gathered = sel(x.astype(jnp.bfloat16))

    # Receiver-term broadcast over each node's K slots as a 0/1 matmul (the
    # MXU is far cheaper than a ragged K-dim reshape on the VPU).
    tile_n = rproj_ref.shape[1]
    rterm = _dot(_expand_matrix(tile_n, k), rproj_ref[0], bf16_operands=False)
    return eproj + gathered + rterm


def _node_kernel(
    edge_ref, idx_ref, sproj_ref, rproj_ref, we_ref, w1_ref, b1_ref, w2_ref,
    b2_ref, out_ref, *, n_nodes, k, exact_gather,
):
    h0 = _message_preact(
        edge_ref, idx_ref, sproj_ref, rproj_ref, we_ref,
        n_nodes=n_nodes, k=k, exact_gather=exact_gather,
    )
    msg = _message_tail(
        h0, w1_ref, b1_ref, w2_ref, b2_ref, bf16_operands=not exact_gather
    )
    # Sum each node's K consecutive message rows: 0/1 matmul on the MXU.
    tile_n = out_ref.shape[1]
    out_ref[0] = jax.lax.dot_general(
        _reduce_matrix(tile_n, k), msg, _CONTRACT, preferred_element_type=jnp.float32
    )


def _edge_kernel(
    edge_ref, idx_ref, sproj_ref, rproj_ref, mask_ref, we_ref, w1_ref, b1_ref,
    w2_ref, b2_ref, scale_ref, offset_ref, out_ref, *, n_nodes, k, eps, exact_gather,
):
    h0 = _message_preact(
        edge_ref, idx_ref, sproj_ref, rproj_ref, we_ref,
        n_nodes=n_nodes, k=k, exact_gather=exact_gather,
    )
    msg = _message_tail(
        h0, w1_ref, b1_ref, w2_ref, b2_ref, bf16_operands=not exact_gather
    )
    x = edge_ref[0] + msg
    # Per-edge-row receiver-node mask, broadcast by the same 0/1 matmul.
    tile_n = mask_ref.shape[1]
    m = _dot(_expand_matrix(tile_n, k), mask_ref[0], bf16_operands=False)  # (TILE_E, 1)
    # Masked layer-norm with the reference's exact quirk (gnn_layers.py:
    # 108-164): pre-mask the input, mask again inside the mean, divide by the
    # full channel count.  The mask is constant per edge row.
    x = m * x
    mean = jnp.mean(m * x, axis=-1, keepdims=True)
    var = jnp.mean(m * jnp.square(x - mean), axis=-1, keepdims=True)
    inv = scale_ref[:] * jax.lax.rsqrt(var + eps)
    out_ref[0] = inv * (x - mean) + offset_ref[:]


def _tile_n(n_nodes: int, tile_n: int) -> int:
    while n_nodes % tile_n:
        tile_n //= 2
    return max(tile_n, 1)


def _common_specs(tile_n, k, d, n_nodes):
    """BlockSpecs shared by both kernels: edge tile, sender ids, projections."""
    tile_e = tile_n * k
    return [
        pl.BlockSpec((1, tile_e, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_e, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        # Whole per-sample node projection; refetched only when b advances.
        pl.BlockSpec((1, n_nodes, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
    ]


_WEIGHT_SPECS = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret", "exact_gather"))
def fused_mpnn_node_update(
    edges: jax.Array,  # (B, E, D) f32 edge table, E = N*K canonical order
    senders: jax.Array,  # (B, E) int32 sender ids
    sender_proj: jax.Array,  # (B, N, D) f32 node_feats @ W_sender
    receiver_proj: jax.Array,  # (B, N, D) f32 node_feats @ W_receiver + b0
    we: jax.Array,  # (D, D) edge slice of the first MLP weight
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    k: int,
    tile_n: int = 32,
    interpret: bool | None = None,
    exact_gather: bool = False,
) -> jax.Array:  # (B, N, D) aggregated messages (sum over K slots)
    b, e, d = edges.shape
    n = e // k
    tile_n = _tile_n(n, tile_n)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_node_kernel, n_nodes=n, k=k, exact_gather=exact_gather),
        interpret=interpret,
        grid=(b, n // tile_n),
        in_specs=_common_specs(tile_n, k, d, n) + _WEIGHT_SPECS,
        out_specs=pl.BlockSpec(
            (1, tile_n, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
    )(
        edges,
        senders[..., None],
        sender_proj,
        receiver_proj,
        we,
        w1,
        b1.reshape(1, -1),
        w2,
        b2.reshape(1, -1),
    )


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "eps", "interpret", "exact_gather")
)
def fused_mpnn_edge_update(
    edges: jax.Array,  # (B, E, D) f32 edge table (residual input)
    senders: jax.Array,  # (B, E) int32
    sender_proj: jax.Array,  # (B, N, D) from the *updated* node features
    receiver_proj: jax.Array,  # (B, N, D)
    nodes_mask: jax.Array,  # (B, N, 1) f32 receiver-node validity
    we: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    ln_scale: jax.Array,
    ln_offset: jax.Array,
    *,
    k: int,
    tile_n: int = 32,
    eps: float = 1e-5,
    interpret: bool | None = None,
    exact_gather: bool = False,
) -> jax.Array:  # (B, E, D) updated + masked-layer-normed edge table
    b, e, d = edges.shape
    n = e // k
    tile_n = _tile_n(n, tile_n)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mask_spec = pl.BlockSpec(
        (1, tile_n, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    ln_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    tile_e = tile_n * k
    return pl.pallas_call(
        functools.partial(
            _edge_kernel, n_nodes=n, k=k, eps=eps, exact_gather=exact_gather
        ),
        interpret=interpret,
        grid=(b, n // tile_n),
        in_specs=_common_specs(tile_n, k, d, n) + [mask_spec] + _WEIGHT_SPECS + ln_specs,
        out_specs=pl.BlockSpec(
            (1, tile_e, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, e, d), jnp.float32),
    )(
        edges,
        senders[..., None],
        sender_proj,
        receiver_proj,
        nodes_mask,
        we,
        w1,
        b1.reshape(1, -1),
        w2,
        b2.reshape(1, -1),
        ln_scale.reshape(1, -1),
        ln_offset.reshape(1, -1),
    )
