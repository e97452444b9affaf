"""Checkpoint loading/saving.

Two formats:

1. **Released InstaDeep format** (read-only): ``params.npz`` holds the flat
   leaves in *pytree order* and ``state_variables.npy`` a pickled dict with the
   params treedef (/root/reference/scripts/inference_runner.py:136-165,236-248).
   Because haiku params are a dict-of-dicts, pytree order is simply sorted
   scope keys then sorted leaf names — so we can reconstruct the tree from a
   template of the expected parameter structure *without unpickling a foreign
   PyTreeDef* (which may not deserialize across jax versions).  The
   ``forward_vq3_d/`` scope prefix is stripped as the reference loader does.

2. **Native format**: an .npz with explicit ``scope//name`` keys —
   self-describing, no pickle, byte-stable across versions.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from protein_structure_tokenizer_tpu.utils.params import Params


def strip_scope_prefix(params: Params, prefix: str = "forward_vq3_d/") -> Params:
    out = {}
    for scope, leaves in params.items():
        if prefix in scope:
            scope = scope.split(prefix, 1)[1]
        out[scope] = leaves
    return out


def _template_leaf_order(template: Params):
    """Flat leaf order of a two-level params dict under jax pytree rules
    (sorted dict keys at each level)."""
    order = []
    for scope in sorted(template.keys()):
        for name in sorted(template[scope].keys()):
            order.append((scope, name))
    return order


def load_released_params(
    model_dir: str, template: Params, *, scope_prefix: str = "forward_vq3_d/"
) -> Params:
    """Load a released HF checkpoint directory into our param tree.

    Args:
      model_dir: directory containing ``params.npz`` (+ optionally
        ``state_variables.npy``, unused here — see module docstring).
      template: a params tree with the expected structure (e.g. from
        ``vq3d.init``); defines the leaf order and shape checks.
    """
    npz_path = os.path.join(model_dir, "params.npz")
    with open(npz_path, "rb") as f:
        uploaded = np.load(f)
        arrays = [uploaded[name] for name in uploaded.files]

    # The released tree's scopes carry the transform-level prefix; order is
    # unaffected by a shared prefix on every key.
    prefixed = {f"{scope_prefix}{scope}": leaves for scope, leaves in template.items()}
    order = _template_leaf_order(prefixed)
    if len(order) != len(arrays):
        raise ValueError(
            f"checkpoint has {len(arrays)} arrays but the model expects {len(order)}"
        )
    params: Params = {}
    for (scope, name), arr in zip(order, arrays):
        scope = scope.split(scope_prefix, 1)[1]
        expected = template[scope][name]
        if tuple(arr.shape) != tuple(expected.shape):
            raise ValueError(
                f"shape mismatch for {scope}:{name}: checkpoint {arr.shape} vs "
                f"model {tuple(expected.shape)}"
            )
        params.setdefault(scope, {})[name] = arr
    return params


def load_released_params_with_treedef(model_dir: str, *, trusted: bool = False) -> Params:
    """Reference-faithful loader using the pickled treedef (may fail across
    jax versions; kept for completeness/diagnostics).

    Unpickling executes arbitrary code from the artifact, so this refuses to
    run unless ``trusted=True`` is passed explicitly.  Prefer
    :func:`load_released_params`, which never unpickles and is proven
    equivalent by ``tests/test_checkpoints.py``.
    """
    if not trusted:
        raise ValueError(
            "state_variables.npy holds a *pickled* treedef; loading it executes "
            "code from the checkpoint. Pass trusted=True only for artifacts you "
            "produced yourself, or use load_released_params (pickle-free)."
        )
    import jax

    info = np.load(
        os.path.join(model_dir, "state_variables.npy"), allow_pickle=True
    ).item()
    with open(os.path.join(model_dir, "params.npz"), "rb") as f:
        uploaded = np.load(f)
        arrays = [np.asarray(uploaded[name]) for name in uploaded.files]
    params = jax.tree_util.tree_unflatten(info["params_treedef"], arrays)
    return strip_scope_prefix(params)


# ---------------------------------------------------------------------------
# Native format
# ---------------------------------------------------------------------------


def save_params(params: Params, path: str) -> None:
    arrays: Dict[str, np.ndarray] = {}
    for scope, leaves in params.items():
        for name, arr in leaves.items():
            arrays[f"{scope}//{name}"] = np.asarray(arr)
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp if tmp.endswith(".npz") else tmp + ".npz", path)


def load_weights(
    path: str, template: Params, *, scope_prefix: str = "forward_vq3_d/"
) -> Params:
    """Auto-detecting weights loader for CLI ``--weights``: accepts either
    the released HF checkpoint DIRECTORY (``params.npz`` with positional
    arrays, :func:`load_released_params`) or a native single-file npz
    written by ``cli/train.py --export_params`` (``scope//name`` keys,
    :func:`load_params`) — so weights trained by this framework round-trip
    through the same flag as released ones."""
    if os.path.isfile(path):
        return load_params(path, template)
    npz_path = os.path.join(path, "params.npz")
    with open(npz_path, "rb") as f:
        keys = np.load(f).files
    if keys and all("//" in k for k in keys):
        return load_params(npz_path, template)
    return load_released_params(path, template, scope_prefix=scope_prefix)


def load_params(path: str, template: Optional[Params] = None) -> Params:
    data = np.load(path)
    params: Params = {}
    for key in data.files:
        scope, name = key.split("//")
        params.setdefault(scope, {})[name] = data[key]
    if template is not None:
        from protein_structure_tokenizer_tpu.utils.params import assert_compatible

        assert_compatible(template, params)
    return params
