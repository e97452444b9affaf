"""FSQ unit tests: codec bijections for all released level sets + reference parity."""
import numpy as np
import pytest

from conftest import requires_reference

import jax.numpy as jnp

from protein_structure_tokenizer_tpu.models.fsq import (
    FsqConfig,
    bound,
    codes_to_indexes,
    implicit_codebook,
    indexes_to_codes,
    quantize,
)

LEVEL_SETS = [(4, 4, 3, 3, 3), (4, 4, 4, 3, 3, 3), (4, 4, 4, 4, 4, 4), (8, 8, 8, 5, 5, 5)]


@pytest.mark.parametrize("levels", LEVEL_SETS)
def test_index_code_bijection(levels):
    cfg = FsqConfig(levels=levels)
    idx = jnp.arange(cfg.num_codes)
    codes = indexes_to_codes(cfg, idx)
    half = jnp.asarray(levels) // 2
    back = codes_to_indexes(cfg, codes / half)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))


@pytest.mark.parametrize("levels", LEVEL_SETS)
def test_bound_range(levels):
    cfg = FsqConfig(levels=levels)
    z = jnp.asarray(np.random.RandomState(0).randn(1000, len(levels)) * 10)
    b = bound(cfg, z)
    lv = np.asarray(levels)
    # Rounding the bounded value must always land on a valid grid point.
    rounded = np.round(np.asarray(b))
    lo, hi = -(lv // 2), (lv - 1) // 2
    assert np.all(rounded >= lo) and np.all(rounded <= hi)


def test_quantize_masks_and_tokens():
    cfg = FsqConfig(levels=(4, 4, 4, 4, 4, 4))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 6).astype(np.float32))
    mask = np.ones((2, 8, 6), np.float32)
    mask[:, 5:] = 0
    out = quantize(cfg, x, jnp.asarray(mask), compute_distances=True)
    assert out["tokens"].shape == (2, 8)
    # Masked positions bound to zeros -> their token is the id of the zero code.
    zero_token = int(
        np.asarray(codes_to_indexes(cfg, jnp.zeros((1, 6)) / (jnp.asarray(cfg.levels) // 2)))[0]
    )
    assert np.all(np.asarray(out["tokens"])[:, 5:] == zero_token)
    assert out["soft_proba"].shape == (2, 8, 4096)


@requires_reference
@pytest.mark.parametrize("levels", LEVEL_SETS)
def test_reference_parity(levels):
    from refmodel import import_reference

    import_reference()
    import jax

    jax.lax.pmean_orig = jax.lax.pmean
    import structure_tokenizer.model.quantize as qmod

    qmod.jax.lax.pmean = lambda x, axis_name=None: x
    import haiku as hk
    from ml_collections import ConfigDict

    cfg = FsqConfig(levels=levels)
    ref_cfg = ConfigDict(
        {
            "levels": list(levels),
            "num_codes": cfg.num_codes,
            "renorm": False,
        }
    )

    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, len(levels)).astype(np.float32)
    mask = np.ones_like(x)
    mask[:, 12:] = 0

    def fn(inputs, masks):
        return qmod.FiniteScalarCodebook(ref_cfg, name="fsq")(inputs, masks, False)

    f = hk.transform(fn)
    params = f.init(jax.random.PRNGKey(0), x, mask)
    ref_out = f.apply(params, jax.random.PRNGKey(0), x, mask)

    ours = quantize(cfg, jnp.asarray(x), jnp.asarray(mask), compute_distances=True)

    np.testing.assert_array_equal(np.asarray(ours["tokens"]), np.asarray(ref_out["tokens"]))
    np.testing.assert_allclose(
        np.asarray(ours["quantize"]), np.asarray(ref_out["quantize"]), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(ours["continuous_embedding"]),
        np.asarray(ref_out["continuous_embedding"]),
        atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(ours["perplexity"]), np.asarray(ref_out["perplexity"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ours["soft_proba"]), np.asarray(ref_out["soft_proba"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ours["distances"]), np.asarray(ref_out["distances"]), atol=1e-5
    )

    # Token -> code inverse parity.
    ref_codes = qmod.indexes_to_codes(jnp.asarray(list(levels)), ref_out["tokens"]) * (
        jnp.asarray(list(levels)) // 2
    )
    ours_codes = indexes_to_codes(cfg, ours["tokens"])
    np.testing.assert_allclose(np.asarray(ours_codes), np.asarray(ref_codes), atol=0)


def test_implicit_codebook_shape():
    cfg = FsqConfig(levels=(4, 4, 3, 3, 3))
    cb = implicit_codebook(cfg)
    assert cb.shape == (432, 5)
    assert len(np.unique(np.asarray(cb), axis=0)) == 432
