"""Parameter-tree utilities.

The framework stores parameters as a *flat* two-level mapping::

    params: dict[str, dict[str, jax.Array]]
    #        ^scope path           ^leaf name

The scope strings are chosen to be byte-identical to the haiku module paths of
the reference release (after the ``forward_vq3_d/`` prefix strip performed by
its loader, see /root/reference/scripts/inference_runner.py:153-165).  That
makes the released InstaDeep checkpoints (params.npz + state_variables.npy)
loadable into this framework with zero renaming logic, while the module code
itself is a fresh functional JAX implementation.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

import jax
import jax.numpy as jnp

Params = Dict[str, Dict[str, jax.Array]]


def subtree(params: Params, prefix: str) -> Params:
    """Return all scopes under ``prefix`` with the prefix stripped.

    ``subtree(p, "a/b")`` maps ``"a/b/c" -> "c"`` and ``"a/b" -> ""``.
    """
    out: Params = {}
    for scope, leaves in params.items():
        if scope == prefix:
            out[""] = leaves
        elif scope.startswith(prefix + "/"):
            out[scope[len(prefix) + 1 :]] = leaves
    return out


def with_prefix(params: Params, prefix: str) -> Params:
    """Inverse of :func:`subtree`: re-root every scope under ``prefix``."""
    out: Params = {}
    for scope, leaves in params.items():
        out[prefix if scope == "" else f"{prefix}/{scope}"] = leaves
    return out


def merge(*trees: Params) -> Params:
    out: Params = {}
    for tree in trees:
        for scope, leaves in tree.items():
            if scope in out:
                out[scope] = {**out[scope], **leaves}
            else:
                out[scope] = dict(leaves)
    return out


def map_leaves(fn: Callable[[jax.Array], Any], params: Params) -> Params:
    return {s: {k: fn(v) for k, v in leaves.items()} for s, leaves in params.items()}


def num_params(params: Params) -> int:
    return sum(int(v.size) for leaves in params.values() for v in leaves.values())


def cast(params: Params, dtype: jnp.dtype) -> Params:
    return map_leaves(lambda x: x.astype(dtype), params)


def assert_compatible(expected: Params, got: Mapping[str, Mapping[str, Any]]) -> None:
    """Raise with a readable diff if two param trees disagree in keys/shapes."""
    problems = []
    for scope, leaves in expected.items():
        if scope not in got:
            problems.append(f"missing scope: {scope}")
            continue
        for name, arr in leaves.items():
            if name not in got[scope]:
                problems.append(f"missing leaf: {scope}:{name}")
            elif tuple(got[scope][name].shape) != tuple(arr.shape):
                problems.append(
                    f"shape mismatch {scope}:{name}: expected {tuple(arr.shape)}"
                    f" got {tuple(got[scope][name].shape)}"
                )
    for scope in got:
        if scope not in expected:
            problems.append(f"unexpected scope: {scope}")
    if problems:
        raise ValueError("parameter tree mismatch:\n  " + "\n  ".join(problems))
