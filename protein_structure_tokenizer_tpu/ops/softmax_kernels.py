"""Pallas TPU kernel: single-pass fused IPA attention softmax.

The fold-loop softmax is the largest non-roofline item left in decode
(round-4 xplane trace, bf16 B=32/N=512): XLA schedules the chain
[logits einsum out (f32) -> bias/mask elementwise + row-max (re-materializes
the biased (B, h, N, N) f32 tensor; reduces cannot fuse into matmul outputs
on TPU) -> exp/divide/convert (another full read) ] as ~3 full passes over
the 400 MB logits tensor, ~3.7 ms of the ~9.4 ms fold iteration.

This kernel reads the raw logits ONCE and emits normalized probabilities in
both dtypes the consumers want (f32 for the point-value aggregation under a
bf16 compute policy, bf16 for the scalar/pair contractions) — one HBM pass:
read 400 MB f32 + 200 MB bias, write what the consumers need.

Two algebraic reductions make the single pass possible (fast path only —
``exact`` keeps the reference formulas bit-for-bit):

  * the |q|^2 row bias of the fused-logit IPA form is CONSTANT PER ROW, so
    softmax is invariant to it — it is simply dropped;
  * the pairwise mask term ``-1e5 * (1 - mask_q * mask_k)`` is row-constant
    wherever ``mask_q`` differs from 1, so softmax only sees its COLUMN
    component — the kernel takes one fused per-column additive bias
    ``col_bias = -0.5 * head_weight * |k|^2 - 1e5 * (1 - mask_k)``.

Reference semantics: folding.py:219-247 (logits + 2d bias + mask +
jax.nn.softmax); numerical equivalence with the jnp fast path is pinned in
tests/test_ops.py, token/coordinate equivalence in the model suites.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(l_ref, cb_ref, a2_ref, *out_refs):
    x = l_ref[0] + cb_ref[0]  # (TILE_R, N) f32 + (1, N) col bias
    x = x + a2_ref[0].astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    for ref in out_refs:
        ref[0] = p.astype(ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("emit_f32", "tile_rows", "interpret")
)
def fused_ipa_softmax(
    logits: jax.Array,  # (B, H, Nq, Nk) f32 — RAW fused-logit einsum output
    col_bias: jax.Array,  # (B, H, Nk) f32 — -0.5*hw*|k|^2 - 1e5*(1-mask_k)
    attention_2d: jax.Array,  # (B, H, Nq, Nk) — pair bias (any float dtype)
    *,
    emit_f32: bool = True,
    tile_rows: int = 128,
    interpret: bool = False,
):
    """softmax(logits + col_bias[..., None, :] + attention_2d, axis=-1).

    Returns ``(probs_f32, probs_bf16)``; ``probs_f32`` is None when
    ``emit_f32=False`` (the all-f32 fast path only consumes the bf16 copy,
    so the second 400 MB write would be dead weight).
    """
    b, h, nq, nk = logits.shape
    if nq % tile_rows:
        tile_rows = 8 if nq % 8 == 0 else 1
    bh = b * h
    l3 = logits.reshape(bh, nq, nk)
    a3 = attention_2d.reshape(bh, nq, nk)
    cb3 = col_bias.reshape(bh, 1, nk)

    out_shapes = []
    if emit_f32:
        out_shapes.append(jax.ShapeDtypeStruct((bh, nq, nk), jnp.float32))
    out_shapes.append(jax.ShapeDtypeStruct((bh, nq, nk), jnp.bfloat16))

    row_spec = pl.BlockSpec((1, tile_rows, nk), lambda i, j: (i, j, 0))
    outs = pl.pallas_call(
        _kernel,
        grid=(bh, nq // tile_rows),
        in_specs=[
            row_spec,
            pl.BlockSpec((1, 1, nk), lambda i, j: (i, 0, 0)),
            row_spec,
        ],
        out_specs=[row_spec] * len(out_shapes),
        out_shape=out_shapes,
        interpret=interpret,
    )(l3, cb3, a3)

    outs = [o.reshape(b, h, nq, nk) for o in outs]
    if emit_f32:
        return outs[0], outs[1]
    return None, outs[0]
