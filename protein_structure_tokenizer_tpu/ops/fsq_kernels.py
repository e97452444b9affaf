"""Pallas TPU kernels for FSQ codebook diagnostics.

The reference computes a full (B, N, K, D) squared-difference tensor against
the materialized codebook for its ``soft_proba``/``distances`` outputs
(/root/reference/structure_tokenizer/model/quantize.py:227-239) — at K=64000
that intermediate is ~100 GB for a 32x512 batch.  This kernel tiles the
(B*N, K) output over a grid and synthesizes each codebook tile *on the fly*
from the implicit mixed-radix integer grid (codes never touch HBM), so the
only memory traffic is the input rows once per K-tile and the (B*N, K) output
once.

Token ids never depend on this path; it feeds diagnostics only, so the jnp
fallback (models/fsq.py) remains the conformance reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _grid_constants(levels):
    levels = tuple(int(x) for x in levels)
    basis = np.concatenate([[1], np.cumprod(levels[:-1])]).astype(np.int32)
    half = (np.asarray(levels, np.int32) // 2).astype(np.float32)
    return levels, basis, half


def _distance_kernel(x_ref, out_ref, *, levels, basis, half, tile_k):
    """out[m, j] = sum_d (x[m, d] - code(k0 + j, d))^2 for one (M, K) tile."""
    k0 = pl.program_id(1) * tile_k
    # Column code ids for this tile: (1, TK) int32.
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, tile_k), dimension=1) + k0
    x = x_ref[:]  # (TM, D)
    acc = jnp.zeros((x.shape[0], tile_k), jnp.float32)
    for d, (level, base, h) in enumerate(zip(levels, basis, half)):
        digit = jax.lax.rem(jax.lax.div(ids, jnp.int32(base)), jnp.int32(level))
        code_d = digit.astype(jnp.float32) - h  # implicit-grid code value
        diff = x[:, d : d + 1] - code_d
        acc = acc + diff * diff
    out_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("levels", "tile_m", "tile_k", "interpret")
)
def fsq_distances(
    bounded: jax.Array,
    *,
    levels: tuple,
    tile_m: int = 256,
    tile_k: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Squared distances from each row to every implicit-grid code.

    Args:
      bounded: (..., D) continuous embeddings after ``bound`` (f32).
      levels: the static FSQ level tuple; K = prod(levels).
    Returns:
      (..., K) f32 distances, bit-matching the jnp path (same per-row
      sum order over D).
    """
    levels, basis, half = _grid_constants(levels)
    num_codes = int(np.prod(levels))
    lead_shape = bounded.shape[:-1]
    d = bounded.shape[-1]
    assert d == len(levels), (d, levels)
    x = bounded.reshape(-1, d).astype(jnp.float32)
    m = x.shape[0]

    # Mosaic requires the trailing block dims be multiples of (8, 128) or the
    # full array dims.  Pick the largest lane-aligned K tile <= tile_k that
    # divides K; small codebooks (432/1728) fall back to a single full tile.
    tk = 0
    for cand in range(128, tile_k + 1, 128):
        if num_codes % cand == 0:
            tk = cand
    if tk == 0:
        tk = num_codes
    tm = 0
    for cand in range(8, min(tile_m, m) + 1, 8):
        if m % cand == 0:
            tm = cand
    if tm == 0:
        tm = m

    kernel = functools.partial(
        _distance_kernel,
        levels=levels,
        basis=tuple(int(b) for b in basis),
        half=tuple(float(h) for h in half),
        tile_k=tk,
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(m // tm, num_codes // tk),
        in_specs=[
            pl.BlockSpec((tm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, num_codes), jnp.float32),
    )(x)
    return out.reshape(*lead_shape, num_codes)
