"""Minimal stand-in for the `jax_dataclasses` package (only what the reference
at /root/reference needs: the `pytree_dataclass` decorator). Used solely to run
the reference implementation side-by-side for golden-equivalence tests."""
import dataclasses

import jax


def pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, name) for name in fields), None

    def unflatten(aux, children):
        return cls(**dict(zip(fields, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls
