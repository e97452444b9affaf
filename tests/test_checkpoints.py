"""Prove the released-HF-checkpoint loaders against the reference's real
on-disk format.

The fixture is written by ``gen_goldens.generate_released_ckpt``: it inits the
reference's own ``ForwardVQ3D`` haiku transform and serializes its params the
way the reference reads them back (/root/reference/scripts/inference_runner.py:136-165,236-248):
``params.npz`` flat leaves in pytree order + ``state_variables.npy`` with the
pickled ``params_treedef``.  These tests fail if either loader's ordering
assumption (template sorted-scope/sorted-leaf order for ``load_released_params``,
foreign-treedef unflatten for ``load_released_params_with_treedef``) deviates
from the format — including the layer_stack stacked leaves, the risky case
flagged in round 1.
"""
import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import preset
from protein_structure_tokenizer_tpu.runtime.checkpoints import (
    load_released_params,
    load_released_params_with_treedef,
)


@pytest.fixture(scope="module")
def released(tmp_path_factory):
    from gen_goldens import generate_released_ckpt

    return generate_released_ckpt(4096, 1)


def _load_expected(released_dir):
    import os

    data = np.load(os.path.join(released_dir, "expected.npz"))
    tree = {}
    for key in data.files:
        scope, name = key.split("//")
        tree.setdefault(scope, {})[name] = data[key]
    return tree


def _assert_tree_equal(ours, expected):
    assert sorted(ours.keys()) == sorted(expected.keys())
    for scope in expected:
        assert sorted(ours[scope].keys()) == sorted(expected[scope].keys()), scope
        for name in expected[scope]:
            np.testing.assert_array_equal(
                np.asarray(ours[scope][name]), expected[scope][name],
                err_msg=f"{scope}//{name}",
            )


@requires_reference
def test_template_loader_reproduces_reference_tree(released):
    """load_released_params (template sorted-order) must rehydrate the exact
    tree the reference's treedef-based loader would produce."""
    template = vq3d.init(jax.random.PRNGKey(0), preset(4096, 1))
    loaded = load_released_params(released, template)
    _assert_tree_equal(loaded, _load_expected(released))


@requires_reference
def test_treedef_loader_reproduces_reference_tree(released):
    # The fixture is self-generated, so unpickling its treedef is safe here.
    loaded = load_released_params_with_treedef(released, trusted=True)
    _assert_tree_equal(loaded, _load_expected(released))


@requires_reference
def test_treedef_loader_refuses_untrusted_pickle(released):
    with pytest.raises(ValueError, match="pickle"):
        load_released_params_with_treedef(released)


@requires_reference
def test_loaded_params_reproduce_reference_tokens(released):
    """End of the north-star chain: params loaded from the released format
    drive our encoder to the reference's bit-exact token ids."""
    import os

    from protein_structure_tokenizer_tpu.data.types import ProteinGraphBatch

    golden = np.load(os.path.join(released, "golden.npz"))
    graph_np = {
        key.split("::", 1)[1]: golden[key]
        for key in golden.files
        if key.startswith("graph::")
    }
    graph = ProteinGraphBatch(
        **{key: jnp.asarray(v) for key, v in graph_np.items()}
    )
    template = vq3d.init(jax.random.PRNGKey(0), preset(4096, 1))
    params = load_released_params(released, template)
    out = vq3d.encode_and_quantize(
        params, preset(4096, 1), graph, compute_usage=False, exact_aggregation=True
    )
    np.testing.assert_array_equal(np.asarray(out["tokens"]), golden["enc::tokens"])


@requires_reference
def test_template_loader_rejects_wrong_leaf_count(released):
    template = vq3d.init(jax.random.PRNGKey(0), preset(4096, 1))
    # Drop one leaf from the template: count mismatch must be loud.
    scope = sorted(template.keys())[0]
    name = sorted(template[scope].keys())[0]
    broken = {s: dict(v) for s, v in template.items()}
    del broken[scope][name]
    if not broken[scope]:
        del broken[scope]
    with pytest.raises(ValueError, match="arrays"):
        load_released_params(released, broken)


def test_load_weights_autodetect(tmp_path):
    """load_weights accepts BOTH --weights formats: a native npz file written
    by cli/train.py --export_params and (detected by key shape) a native npz
    living inside a directory as params.npz; released dirs keep routing to
    load_released_params (covered above)."""
    import os

    from protein_structure_tokenizer_tpu.models.config import tiny_preset
    from protein_structure_tokenizer_tpu.runtime import checkpoints

    cfg = tiny_preset(seq_max=32, k=4, downsampling=1, dim=8)
    params = jax.tree_util.tree_map(
        np.asarray, vq3d.init(jax.random.PRNGKey(1), cfg)
    )

    # native single file (any name)
    f = str(tmp_path / "trained.npz")
    checkpoints.save_params(params, f)
    _assert_tree_equal(checkpoints.load_weights(f, params), params)

    # native file named params.npz inside a directory
    d = tmp_path / "export_dir"
    os.makedirs(d)
    checkpoints.save_params(params, str(d / "params.npz"))
    _assert_tree_equal(checkpoints.load_weights(str(d), params), params)
