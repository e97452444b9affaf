"""RNG-key discipline helpers.

Counterpart of the reference's ``SafeKey``
(/root/reference/structure_tokenizer/model/prng.py:28-63): a wrapper that
raises on key reuse, catching the classic bug of feeding one PRNG key to two
consumers.  Registered as a pytree so it can cross jit boundaries.
"""
from __future__ import annotations

import jax


class SafeKey:
    """Single-use PRNG key wrapper."""

    def __init__(self, key: jax.Array):
        self._key = key
        self._used = False

    def _assert_not_used(self) -> None:
        if self._used:
            raise RuntimeError("Random key has been used previously.")

    def get(self) -> jax.Array:
        self._assert_not_used()
        self._used = True
        return self._key

    def split(self, num_keys: int = 2) -> tuple["SafeKey", ...]:
        self._assert_not_used()
        self._used = True
        return tuple(SafeKey(k) for k in jax.random.split(self._key, num_keys))

    def duplicate(self, num_keys: int = 2) -> tuple["SafeKey", ...]:
        self._assert_not_used()
        self._used = True
        return tuple(SafeKey(self._key) for _ in range(num_keys))


def _safe_key_flatten(key: SafeKey):
    return (key._key,), key._used


def _safe_key_unflatten(used, children):
    out = SafeKey(children[0])
    out._used = used
    return out


jax.tree_util.register_pytree_node(SafeKey, _safe_key_flatten, _safe_key_unflatten)


def padding_consistent_rng(f):
    """Make an elementwise random sampler invariant to padding.

    Counterpart of the reference's padding-consistent RNG discipline
    (/root/reference/structure_tokenizer/model/utils.py:100-148): ``f(key,
    shape)`` normally yields different leading values when ``shape`` grows,
    so padded and unpadded batches see different randomness on the REAL rows.
    The returned function derives one key per output element by folding each
    index along each axis into the key (index i's key never depends on the
    axis length), then draws a scalar per element — identical real-position
    values under any padding.
    """
    import functools

    import jax
    import jax.numpy as jnp

    def grid_keys(key, shape):
        if not shape:
            return key
        keys = jax.vmap(functools.partial(jax.random.fold_in, key))(
            jnp.arange(shape[0])
        )
        return jax.vmap(lambda k: grid_keys(k, shape[1:]))(keys)

    def wrapped(key, shape, **kwargs):
        per_element = grid_keys(key, tuple(shape))
        return jnp.vectorize(
            lambda k: f(k, shape=(), **kwargs), signature="(2)->()"
        )(per_element)

    return wrapped
