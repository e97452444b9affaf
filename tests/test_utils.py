"""Utility-layer tests: chunked_apply, SafeKey."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.utils.chunking import chunked_apply
from protein_structure_tokenizer_tpu.utils.prng import SafeKey


def test_chunked_apply_matches_direct():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 37, 8).astype(np.float32))  # 37 not divisible
    fn = lambda v: jnp.tanh(v) * 2 + 1
    for axis, chunk in [(1, 8), (1, 5), (0, 1), (-2, 16), (1, 100)]:
        out = chunked_apply(fn, x, chunk_size=chunk, axis=axis)
        np.testing.assert_allclose(np.asarray(out), np.asarray(fn(x)), rtol=1e-6)


def test_chunked_transition_matches_whole():
    import dataclasses

    from protein_structure_tokenizer_tpu.models.attention import (
        TransitionConfig,
        transition,
        transition_init,
    )

    cfg = TransitionConfig(num_intermediate_factor=2)
    params = transition_init(jax.random.PRNGKey(0), cfg, 16)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 21, 16).astype(np.float32))
    whole = transition(params, cfg, x)
    chunked = transition(params, dataclasses.replace(cfg, chunk_size=4), x)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(whole), rtol=1e-6, atol=1e-6)


def test_safe_key_single_use():
    key = SafeKey(jax.random.PRNGKey(0))
    a, b = key.split()
    with pytest.raises(RuntimeError):
        key.get()
    assert a.get() is not None
    with pytest.raises(RuntimeError):
        a.split()
    c, d = b.duplicate()
    np.testing.assert_array_equal(np.asarray(c.get()), np.asarray(d.get()))


def test_safe_key_is_pytree():
    key = SafeKey(jax.random.PRNGKey(0))

    @jax.jit
    def use(k: SafeKey):
        return jax.random.uniform(k.get())

    assert np.isfinite(float(use(key)))


def test_padding_consistent_rng():
    """Real-position randomness is invariant to how much padding follows."""
    import jax
    import numpy as np

    from protein_structure_tokenizer_tpu.utils.prng import padding_consistent_rng

    normal = padding_consistent_rng(jax.random.normal)
    key = jax.random.PRNGKey(0)
    small = np.asarray(normal(key, (4, 3)))
    padded = np.asarray(normal(key, (9, 7)))
    np.testing.assert_array_equal(padded[:4, :3], small)
    # And it is actually random across positions.
    assert len(np.unique(small.round(6))) == small.size
