"""Fused pair-representation Pallas kernel vs the jnp path (interpret mode).

The kernel is opt-in (``sequence_decoder(..., use_pallas=True)``): on the
current TPU target XLA's schedule of the jnp chain is faster, but the kernel
is kept as an alternative backend (it bounds HBM traffic to inputs + final
output, which wins on HBM-limited parts).  Correctness is validated here on
the CPU interpreter.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.models.seq_decoder import (
    PairRepConfig,
    SeqDecoderConfig,
    sequence_decoder,
    sequence_decoder_init,
)


@pytest.fixture(scope="module")
def setup():
    cfg = SeqDecoderConfig(
        positional_encoding_dimension=128,
        seq_max_size=128,
        pair_representation=PairRepConfig(output_dim=128),
    )
    params = sequence_decoder_init(jax.random.PRNGKey(0), cfg, 128)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 128, 128).astype(np.float32))
    mask = jnp.asarray((rng.rand(2, 128, 1) > 0.2).astype(np.float32))
    return cfg, params, x, mask


def test_fused_pair_matches_jnp(setup):
    cfg, params, x, mask = setup
    _, z_ref = sequence_decoder(params, cfg, x, mask, use_pallas=False)
    # exact_dots: full-f32 MXU products, so the only difference vs the jnp
    # path is reduction association -> tight tolerance.
    _, z_fused = sequence_decoder(params, cfg, x, mask, use_pallas="exact_dots")
    np.testing.assert_allclose(
        np.asarray(z_fused), np.asarray(z_ref), rtol=1e-4, atol=1e-4
    )
    # Production path (bf16 operand truncation, = XLA DEFAULT precision on
    # TPU): bf16-envelope agreement on the CPU-f32 jnp reference.
    _, z_fast = sequence_decoder(params, cfg, x, mask, use_pallas=True)
    np.testing.assert_allclose(
        np.asarray(z_fast), np.asarray(z_ref), rtol=2e-2, atol=2e-1
    )


def test_fused_pair_relpos_encoding(setup):
    """The in-kernel synthesized relative PE matches the dense-table path even
    for asymmetric (i, j) tiles (sign of j - i matters)."""
    cfg, params, x, mask = setup
    _, z_ref = sequence_decoder(params, cfg, x, mask, use_pallas=False)
    _, z_fused = sequence_decoder(params, cfg, x, mask, use_pallas="exact_dots")
    # Spot-check far off-diagonal corners where diff = +-(N-1).
    for i, j in [(0, 127), (127, 0), (5, 90)]:
        np.testing.assert_allclose(
            np.asarray(z_fused)[:, i, j], np.asarray(z_ref)[:, i, j],
            rtol=1e-4, atol=1e-4,
        )


def test_unsupported_shapes_fall_back(setup):
    """N not divisible by the tile size silently uses the jnp path."""
    cfg, params, _, _ = setup
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 96, 128).astype(np.float32))
    mask = jnp.ones((2, 96, 1), jnp.float32)
    _, z = sequence_decoder(params, cfg, x, mask, use_pallas=True)
    assert z.shape == (2, 96, 96, 128)
