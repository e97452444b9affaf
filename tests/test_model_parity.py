"""End-to-end numerical parity: our Vq3D vs the reference with shared weights.

The fixture (generated lazily by tests/refsupport/gen_goldens.py) contains the
reference's randomly-initialized parameters, a synthetic padded graph batch,
and the reference's encode/decode outputs on CPU.  We hydrate the same
parameters into our model and require:
  * token ids: exactly equal (the conformance north-star)
  * continuous embeddings / coordinates: close to float32 tolerance
"""
import numpy as np
import pytest

from conftest import requires_reference

import jax.numpy as jnp

from protein_structure_tokenizer_tpu.data.types import ProteinGraphBatch
from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import preset


@pytest.fixture(scope="module")
def golden():
    from gen_goldens import generate, load_golden

    path = generate(4096, 1)
    return load_golden(path)


def _to_graph(graph_np) -> ProteinGraphBatch:
    return ProteinGraphBatch(
        n_node=jnp.asarray(graph_np["n_node"]),
        n_edge=jnp.asarray(graph_np["n_edge"]),
        nodes_mask=jnp.asarray(graph_np["nodes_mask"]),
        tokens_mask=jnp.asarray(graph_np["tokens_mask"]),
        nodes_original_coordinates=jnp.asarray(graph_np["nodes_original_coordinates"]),
        node_features=jnp.asarray(graph_np["node_features"]),
        edge_features=jnp.asarray(graph_np["edge_features"]),
        senders=jnp.asarray(graph_np["senders"]),
        receivers=jnp.asarray(graph_np["receivers"]),
    )


@requires_reference
def test_param_tree_compatibility(golden):
    params_ref, *_ = golden
    import jax

    cfg = preset(4096, 1)
    ours = vq3d.init(jax.random.PRNGKey(0), cfg)
    from protein_structure_tokenizer_tpu.utils.params import assert_compatible

    assert_compatible(ours, params_ref)


@requires_reference
def test_encode_and_quantize_parity(golden):
    params, graph_np, feats, enc_ref, dec_ref = golden
    cfg = preset(4096, 1)
    graph = _to_graph(graph_np)

    out = vq3d.encode_and_quantize(
        params, cfg, graph, compute_usage=True, compute_distances=False
    )

    np.testing.assert_allclose(
        np.asarray(out["continuous_embedding_pre_proj"]),
        enc_ref["continuous_embedding_pre_proj"],
        atol=2e-4,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["continuous_embedding"]),
        enc_ref["continuous_embedding"],
        atol=2e-4,
        rtol=1e-4,
    )
    np.testing.assert_array_equal(np.asarray(out["tokens"]), enc_ref["tokens"])
    np.testing.assert_allclose(
        np.asarray(out["quantize"]), enc_ref["quantize"], atol=0
    )
    np.testing.assert_allclose(
        float(out["perplexity"]), float(enc_ref["perplexity"]), rtol=1e-4
    )


@requires_reference
def test_decode_parity(golden):
    params, graph_np, feats, enc_ref, dec_ref = golden
    cfg = preset(4096, 1)

    out = vq3d.decode_and_make_structure(
        params,
        cfg,
        jnp.asarray(enc_ref["quantize"]),
        jnp.asarray(graph_np["nodes_mask"]),
        jnp.asarray(graph_np["tokens_mask"]),
    )

    np.testing.assert_array_equal(
        np.asarray(out["final_atom_mask"]), dec_ref["final_atom_mask"]
    )
    np.testing.assert_allclose(
        np.asarray(out["traj"]), dec_ref["traj"], atol=5e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["final_atom_positions"]),
        dec_ref["final_atom_positions"],
        atol=5e-3,
    )
