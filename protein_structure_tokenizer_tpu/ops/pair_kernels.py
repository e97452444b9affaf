"""Fused pair-representation Pallas kernel (the decode-path HBM hog).

The sequence decoder's pair track chains seven (B, N, N, C) tensor ops —
outer product, 2-layer MLP, residual projection, LayerNorm, relative-PE
merge, transition MLP (seq_decoder.py; reference modules.py:639-740 +
sequence_decoder.py:27-112).  XLA materializes several of the ~4 GB
intermediates in HBM; at B=16, N=512 the stage is HBM-bound.

This kernel tiles the (N, N) plane and runs the WHOLE chain per tile in VMEM:
the only HBM traffic is the two (B, N, C_in) projection tracks in and the
final (B, N, N, C_out) pair tensor out.  The relative-PE features are
synthesized in-register from the tile's index offsets (they depend only on
j - i), so the dense (N, N, D) PE tensor never exists.

Numerics: dots truncate their operands to bf16 with f32 accumulation — the
exact semantics of XLA's DEFAULT matmul precision, which the jnp path uses on
TPU (elementwise math and LN statistics stay f32).  Without the explicit
truncation Mosaic emits multi-pass full-f32 MXU products and the kernel is
compute-bound (~3x slower than the jnp chain at B=32/N=512 — the round-1
failure).  `sequence_decoder(..., exact=True)` bypasses this kernel entirely
for the bit-exact conformance path.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x, scale, offset, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return scale * jax.lax.rsqrt(var + eps) * (x - mean) + offset


def _make_dot(bf16_operands):
    """bf16-operand MXU dot with f32 accumulation (XLA DEFAULT-precision
    semantics — one pass instead of Mosaic's multi-pass full-f32 product).
    ``bf16_operands=False`` keeps full-f32 products for tight-equivalence
    tests against the CPU jnp path."""

    def dot(a, b):
        if bf16_operands:
            a = a.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    return dot


def _pair_kernel(
    left_ref,      # (1, TI, C_in)
    right_ref,     # (1, TJ, C_in)
    w1_ref, b1_ref,      # (C_in, C_mid), (1, C_mid)
    w2_ref, b2_ref,      # (C_mid, C_out), (1, C_out)
    wr_ref, br_ref,      # (C_in, C_out), (1, C_out)
    ln1_s_ref, ln1_o_ref,  # (1, C_out)
    wlr_ref,             # (D_pe, C_out) relpos half of the merge Linear
    wlp_ref, bl_ref,     # (C_out, C_out), (1, C_out) pair half + bias
    pe_a_ref, pe_b_ref, pe_odd_ref,  # (1, D_pe) PE phase consts + parity mask
    ln2_s_ref, ln2_o_ref,  # (1, C_out) transition input LN
    t1_ref, tb1_ref,     # (C_out, C_t), (1, C_t)
    t2_ref, tb2_ref,     # (C_t, C_out), (1, C_out)
    out_ref,             # (1, TI, TJ, C_out)
    *,
    tile_i: int,
    tile_j: int,
    bf16_operands: bool,
):
    _dot = _make_dot(bf16_operands)
    f32 = jnp.float32
    l = left_ref[0]   # (TI, C_in)
    r = right_ref[0]  # (TJ, C_in)

    # Outer product tile: x[a, b, :] = l[a, :] * r[b, :], flattened to rows.
    x = (l[:, None, :] * r[None, :, :]).reshape(tile_i * tile_j, l.shape[-1])

    h = jnp.maximum(_dot(x, w1_ref[:]) + b1_ref[:], 0.0)
    pair = _dot(h, w2_ref[:]) + b2_ref[:]
    pair = pair + _dot(x, wr_ref[:]) + br_ref[:]
    pair = _ln(pair, ln1_s_ref[:], ln1_o_ref[:])

    # Relative-PE features for this tile: diff = (global j) - (global i),
    # built directly in flattened row-major (TI*TJ, 1) layout (Mosaic cannot
    # relayout a (TI, TJ) -> (TI*TJ, 1) shape cast).
    i0 = pl.program_id(1) * tile_i
    j0 = pl.program_id(2) * tile_j
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_i * tile_j, 1), 0)
    ii = jax.lax.div(rows, jnp.int32(tile_j)) + i0
    jj = jax.lax.rem(rows, jnp.int32(tile_j)) + j0
    diff = (jj - ii).astype(f32)
    odd = pe_odd_ref[:]
    feats = odd * jnp.cos(diff * pe_a_ref[:]) + (1.0 - odd) * jnp.sin(diff * pe_b_ref[:])

    merged = _dot(pair, wlp_ref[:]) + _dot(feats, wlr_ref[:]) + bl_ref[:]

    t = _ln(merged, ln2_s_ref[:], ln2_o_ref[:])
    t = jnp.maximum(_dot(t, t1_ref[:]) + tb1_ref[:], 0.0)
    t = _dot(t, t2_ref[:]) + tb2_ref[:]

    out_ref[0] = t.reshape(tile_i, tile_j, t.shape[-1])


def pair_representation_supported(n: int, tile_i: int = 8, tile_j: int = 128) -> bool:
    return n % tile_i == 0 and n % tile_j == 0 and n >= tile_j


@functools.partial(
    jax.jit,
    static_argnames=("seq_max", "pe_dim", "tile_i", "tile_j", "interpret", "bf16_operands"),
)
def fused_pair_representation(
    left: jax.Array,   # (B, N, C_in) masked left projection
    right: jax.Array,  # (B, N, C_in) masked right projection
    weights: dict,     # flat dict of the chain's parameters (see below)
    *,
    seq_max: int,
    pe_dim: int,
    tile_i: int = 8,
    tile_j: int = 128,
    interpret: bool | None = None,
    bf16_operands: bool = True,
) -> jax.Array:
    """Fused outer-product -> MLP -> LN -> relpos merge -> transition.

    ``weights`` keys: w1, b1, w2, b2, wr, br, ln1_scale, ln1_offset,
    wl_rel, wl_pair, bl, ln2_scale, ln2_offset, t1, tb1, t2, tb2.
    Returns the (B, N, N, C_out) pair tensor.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    batch, n, c_in = left.shape
    assert pair_representation_supported(n, tile_i, tile_j), (n, tile_i, tile_j)
    c_out = weights["w2"].shape[-1]

    f32 = jnp.float32
    k = np.arange(1, pe_dim + 1)
    pe_a = (math.pi / seq_max ** (2 * (k - 1) / pe_dim)).astype(np.float32)
    pe_b = (math.pi / seq_max ** (2 * k / pe_dim)).astype(np.float32)
    pe_odd = (k % 2).astype(np.float32)

    def row(v):
        return jnp.asarray(v, f32).reshape(1, -1)

    mat_inputs = [
        jnp.asarray(weights["w1"], f32), row(weights["b1"]),
        jnp.asarray(weights["w2"], f32), row(weights["b2"]),
        jnp.asarray(weights["wr"], f32), row(weights["br"]),
        row(weights["ln1_scale"]), row(weights["ln1_offset"]),
        jnp.asarray(weights["wl_rel"], f32),
        jnp.asarray(weights["wl_pair"], f32), row(weights["bl"]),
        row(pe_a), row(pe_b), row(pe_odd),
        row(weights["ln2_scale"]), row(weights["ln2_offset"]),
        jnp.asarray(weights["t1"], f32), row(weights["tb1"]),
        jnp.asarray(weights["t2"], f32), row(weights["tb2"]),
    ]

    grid = (batch, n // tile_i, n // tile_j)
    const_spec = [
        pl.BlockSpec(m.shape, lambda b, i, j: (0,) * m.ndim, memory_space=pltpu.VMEM)
        for m in mat_inputs
    ]

    return pl.pallas_call(
        functools.partial(
            _pair_kernel, tile_i=tile_i, tile_j=tile_j, bf16_operands=bf16_operands
        ),
        out_shape=jax.ShapeDtypeStruct((batch, n, n, c_out), f32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_i, c_in), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_j, c_in), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            *const_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, tile_i, tile_j, c_out), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(left.astype(f32), right.astype(f32), *mat_inputs)
