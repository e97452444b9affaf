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
