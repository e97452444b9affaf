"""Flash-IPA kernel (ops/ipa_kernels.py) correctness on the CPU interpreter.

The kernel replaces the fast path's logits->softmax->value-contraction chain
(models/structure_module.py); reference semantics are the jnp formulas it
fuses.  f32-dot mode must match a plain jnp transcription to float tolerance;
bf16-operand mode (the TPU default, = XLA DEFAULT matmul precision) stays
within bf16 envelopes.  The exact conformance path bypasses the kernel, so
golden parity tests are unaffected by construction.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.ops.ipa_kernels import (
    flash_ipa,
    flash_ipa_supported,
)

B, H, N, C, CV, CZ = 2, 3, 128, 28, 40, 32


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, H, N, C).astype(np.float32)
    k = rng.randn(B, H, N, C).astype(np.float32)
    v = rng.randn(B, H, N, CV).astype(np.float32)
    bias = rng.randn(B, H, N, N).astype(np.float32)
    qb = rng.randn(B, H, N).astype(np.float32)
    kb = rng.randn(B, H, N).astype(np.float32)
    mask = (rng.rand(B, N) > 0.2).astype(np.float32)
    z = rng.randn(B, N, N, CZ).astype(np.float32)
    return q, k, v, bias, qb, kb, mask, z


def _reference(q, k, v, bias, qb, kb, mask, z):
    """The fast path's math INCLUDING the row terms the kernel drops (they
    are softmax-shift-invariant; this asserts the invariance claim too)."""
    s = jnp.einsum("bhqc,bhkc->bhqk", q, k)
    s = s + qb[..., None] + kb[..., None, :] + bias
    s = s - 1e5 * (1.0 - mask[:, None, :, None] * mask[:, None, None, :])
    p = jax.nn.softmax(s, axis=-1)
    ov = jnp.einsum("bhqk,bhkc->bhqc", p, v)
    oz = jnp.einsum("bhij,bijc->bihc", p, z)
    return ov, oz


def test_supported_predicate():
    assert flash_ipa_supported(512)
    assert flash_ipa_supported(128)
    assert not flash_ipa_supported(64)
    assert not flash_ipa_supported(130)


def test_flash_ipa_f32_matches_reference():
    q, k, v, bias, qb, kb, mask, z = _inputs()
    kb_folded = kb - 1e5 * (1.0 - mask[:, None, :])
    ov, oz = flash_ipa(
        q, k, v, bias, kb_folded, jnp.asarray(z),
        interpret=True, bf16_operands=False,
    )
    rov, roz = _reference(q, k, v, bias, qb, kb, mask, z)
    # Valid query rows only: for masked rows the reference's -1e5*(1-mi*mj)
    # term drowns the column mask (softmax goes uniform over ALL columns)
    # while the kernel keeps the column mask — both are garbage that every
    # consumer slices away, but different garbage.
    rows = mask.astype(bool)  # (B, N)
    ov_v = np.asarray(jnp.swapaxes(ov, 1, 2))[rows]    # (valid, H, CV)
    rov_v = np.asarray(jnp.swapaxes(rov, 1, 2))[rows]
    np.testing.assert_allclose(ov_v, rov_v, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(oz)[rows], np.asarray(roz)[rows],
                               atol=1e-4, rtol=1e-4)


def test_flash_ipa_bf16_within_envelope():
    """TPU-default bf16-operand dots: logits move by ~|s|*2^-8, so compare
    softmax outputs loosely but require the big picture to agree."""
    q, k, v, bias, qb, kb, mask, z = _inputs(1)
    kb_folded = kb - 1e5 * (1.0 - mask[:, None, :])
    ov, oz = flash_ipa(
        q, k, v, bias, kb_folded, jnp.asarray(z, jnp.bfloat16),
        interpret=True, bf16_operands=True,
    )
    rov, roz = _reference(q, k, v, bias, qb, kb, mask, z)
    rows = mask.astype(bool)
    dv = np.abs(np.asarray(jnp.swapaxes(ov, 1, 2)) - np.asarray(jnp.swapaxes(rov, 1, 2)))
    assert dv[rows].mean() < 0.05
    assert np.abs(np.asarray(oz) - np.asarray(roz))[rows].mean() < 0.05


def test_flash_ipa_inside_structure_module():
    """use_pallas=True routes the scan's IPA through the kernel (interpret
    mode on CPU); outputs stay within the fast-path envelope and shapes/masks
    are unchanged."""
    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.models.config import tiny_preset

    cfg = tiny_preset(seq_max=128, k=4, downsampling=2, dim=16)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    quantized = jnp.asarray(rng.randn(2, 64, 6).astype(np.float32))
    nodes_mask = jnp.ones((2, 128, 1), jnp.float32)
    tokens_mask = jnp.ones((2, 64, 1), jnp.float32)

    out_flash = vq3d.decode_and_make_structure(
        params, cfg, quantized, nodes_mask, tokens_mask, use_pallas=True
    )
    out_ref = vq3d.decode_and_make_structure(
        params, cfg, quantized, nodes_mask, tokens_mask, use_pallas=False
    )
    pos_f = np.asarray(out_flash["final_atom_positions"])
    pos_r = np.asarray(out_ref["final_atom_positions"])
    np.testing.assert_array_equal(
        np.asarray(out_flash["final_atom_mask"]),
        np.asarray(out_ref["final_atom_mask"]),
    )
    assert pos_f.shape == pos_r.shape
    assert np.isfinite(pos_f).all()
    # bf16 logit truncation error amplified through 8 fold iterations on
    # random weights: require agreement at the coordinate scale.
    scale = np.abs(pos_r).mean() + 1e-6
    assert np.abs(pos_f - pos_r).mean() / scale < 0.15, (
        np.abs(pos_f - pos_r).mean(), scale
    )
