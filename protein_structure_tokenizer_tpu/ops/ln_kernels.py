"""Pallas TPU kernel: single-pass LayerNorm for the big pair-track tensors.

LayerNorm over the minor channel axis is tile-local, yet XLA schedules it as
TWO full passes over the tensor: the (variadic) moments reduce reads the
(B, N, N, C) tensor once (~2.9 ms at bf16 B=32/N=512), then a separate
normalize fusion reads it AGAIN and writes the output (~6.4 ms).  With the
whole row of C=128 channels inside one tile, a Pallas kernel computes the
moments in-register and normalizes in the same pass: one read + one write,
~2x less HBM traffic per LN.  The bf16 decode path runs three such LNs on
(B, N, N, 128) tensors (pair-representation output, pair transition,
structure-module pair LN).

Numerics: moments accumulate f32 (the jnp one-pass path casts the mean back
to bf16 before the variance subtraction — the kernel keeps f32 throughout,
strictly more accurate; both live inside the bf16 path's pinned coordinate
tolerance band).  Gated to bf16 inputs on single-device TPU — the default
f32 fast path keeps the jnp chain, preserving its documented ~1e-4
proximity to exact mode.  Reference semantics: hk.LayerNorm over the last
axis (modules.py / folding.py call sites).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(eps, x_ref, scale_ref, offset_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)  # (TILE_R, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0)
    inv = scale_ref[...].astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (
        inv * (x - mean) + offset_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_layer_norm(
    x: jax.Array,  # (..., C)
    scale: jax.Array,  # (C,)
    offset: jax.Array,  # (C,)
    *,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """One-pass LayerNorm over the last axis; returns ``None`` (caller falls
    back to the jnp path) when no supported tiling divides the row count."""
    c = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    tile = next((t for t in (4096, 2048, 512, 64, 8) if rows % t == 0), None)
    if tile is None or c % 128:
        return None
    x2 = x.reshape(rows, c)
    out = pl.pallas_call(
        functools.partial(_kernel, eps),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, c), offset.reshape(1, c))
    return out.reshape(x.shape)
