"""Flash-style invariant-point-attention Pallas kernel.

The decode path's 8-iteration IPA scan is HBM-bound on (B, h, N, N) f32
traffic: the fused logit einsum writes it, softmax re-reads/writes it, and the
two value contractions read it again — ~5 full passes over ~400 MB per fold
iteration at B=32/N=512 (reference hot loop: folding.py:36-288; our fast path
models/structure_module.py:130-214).

This kernel never materializes the logits in HBM.  For each (batch, query
tile) it holds the full key axis in VMEM — at IPA sizes (N <= 512, h = 12)
the whole K/V/bias working set is ~3 MB, so no online-softmax machinery is
needed — computes logits + rank-1 biases + pair bias + mask + softmax in
registers, and contracts the probabilities against BOTH value tracks:

  * the concatenated scalar++point values (the fast path's single
    ``result_cat`` contraction), and
  * the pair representation z_ij (the ``bhij,bijc->bihc`` attention-over-2d
    term) — read once per iteration as bf16, its HBM-roofline minimum.

Per-iteration HBM traffic drops from ~5 passes of (B,h,N,N) f32 + a f32 read
of z to: one read of the (pre-transposed, iteration-invariant) pair bias and
one bf16 read of z.

Numerics: dots truncate operands to bf16 with f32 accumulation — the same
semantics as XLA's DEFAULT matmul precision which the jnp fast path uses on
TPU (softmax and bias adds stay f32).  ``bf16_operands=False`` keeps full-f32
products for tight CPU equivalence tests.  The ``exact`` conformance path
bypasses this kernel entirely (structure_module(..., exact=True)).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b, dims, bf16_operands):
    if bf16_operands:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def _flash_ipa_kernel(
    q_ref,      # (1, h, TI, C)
    k_ref,      # (1, h, N, C)
    v_ref,      # (1, h, N, Cv)
    bias_ref,   # (1, h, TI, N)  pair bias, pre-scaled
    kb_ref,     # (1, h, N)      column bias: rank-1 point term + key mask
    z_ref,      # (1, TI, N, Cz) pair representation (bf16)
    ov_ref,     # (1, h, TI, Cv)
    oz_ref,     # (1, TI, h, Cz)
    *,
    tile_i: int,
    bf16_operands: bool,
):
    f32 = jnp.float32
    q = q_ref[0]  # (h, TI, C)
    k = k_ref[0]  # (h, N, C)

    # Logits: batched-over-heads q @ k^T with the scalar and sqrt(hw)-scaled
    # point dims concatenated on the contraction axis (the |q-k|^2 expansion's
    # cross term; models/structure_module.py:130-148).  The fast path's
    # remaining terms that are CONSTANT along the key axis — the -0.5*hw*|q|^2
    # row bias and the query-row mask — are softmax-shift-invariant and
    # dropped; the key-axis terms (-0.5*hw*|k|^2 and -1e5*(1-mask_j)) arrive
    # pre-folded into ``kb``.
    s = _dot(q, k, (((2,), (2,)), ((0,), (0,))), bf16_operands)  # (h, TI, N)
    s = s + kb_ref[0][:, None, :] + bias_ref[0]

    # Full-row softmax in registers (keys fit in VMEM at IPA sizes).
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # (h, TI, N) f32

    # Scalar ++ point value aggregation, batched over heads.
    ov_ref[0] = _dot(
        p, v_ref[0], (((2,), (1,)), ((0,), (0,))), bf16_operands
    )  # (h, TI, Cv)

    # Attention over the pair track: z depends on the QUERY row, so batch the
    # contraction over the tile's rows (each row: (h, N) @ (N, Cz)).
    z = z_ref[0]  # (TI, N, Cz) bf16
    pt = jnp.transpose(p, (1, 0, 2))  # (TI, h, N)
    oz_ref[0] = _dot(pt, z, (((2,), (1,)), ((0,), (0,))), bf16_operands)


def flash_ipa_supported(n: int, tile_i: int = 8) -> bool:
    return n % tile_i == 0 and n >= 128


@functools.partial(
    jax.jit, static_argnames=("tile_i", "interpret", "bf16_operands")
)
def flash_ipa(
    q_cat: jax.Array,   # (B, h, N, C) f32, scalar weights + sqrt(hw) folded in
    k_cat: jax.Array,   # (B, h, N, C) f32
    v_cat: jax.Array,   # (B, h, N, Cv) f32
    bias2d: jax.Array,  # (B, h, N, N) f32, attention_2d_weights folded in
    kb: jax.Array,      # (B, h, N) f32: -0.5*hw*|k_pts|^2 - 1e5*(1-mask_j)
    z2d: jax.Array,     # (B, N, N, Cz) bf16 (or f32)
    *,
    tile_i: int = 8,
    interpret: bool | None = None,
    bf16_operands: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Fused IPA attention: logits -> softmax -> both value contractions.

    Returns ``(o_v (B, h, N, Cv) f32, o_z (B, N, h, Cz) f32)`` matching the
    fast path's ``result_cat`` and ``bhij,bijc->bihc`` layouts.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    batch, h, n, c = q_cat.shape
    cv = v_cat.shape[-1]
    cz = z2d.shape[-1]
    assert flash_ipa_supported(n, tile_i), (n, tile_i)
    f32 = jnp.float32

    grid = (batch, n // tile_i)  # i fastest: per-b K/V blocks stay resident
    kernel = functools.partial(
        _flash_ipa_kernel, tile_i=tile_i, bf16_operands=bf16_operands
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((batch, h, n, cv), f32),
            jax.ShapeDtypeStruct((batch, n, h, cz), f32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, tile_i, c), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, c), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, cv), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, tile_i, n), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_i, n, cz), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, tile_i, cv), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_i, h, cz), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        q_cat.astype(f32), k_cat.astype(f32), v_cat.astype(f32),
        bias2d.astype(f32), kb.astype(f32), z2d,
    )
