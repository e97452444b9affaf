"""Token-id parity across released model variants vs the reference.

Covers the axes test_model_parity.py's flagship (4096, df=1) does not:
  * 432 — 5-dim FSQ codes (down_proj 128->5, levels (4,4,3,3,3))
  * df=2 / df=4 — local-attention rolled-window masks on the downsampler
    (reference model.py:264-318) and tokens_mask = N/df construction.

64k is covered at the FSQ-codec level in test_fsq.py (model-level golden would
require the reference to materialize a (B,512,64000,6) distance tensor on CPU).
"""
import numpy as np
import pytest

from conftest import requires_reference

import jax.numpy as jnp

from protein_structure_tokenizer_tpu.data.types import ProteinGraphBatch
from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import preset

VARIANTS = [(432, 1), (4096, 2), (4096, 4)]


@pytest.fixture(scope="module", params=VARIANTS, ids=lambda v: f"{v[0]}_df{v[1]}")
def variant_golden(request):
    from gen_goldens import generate, load_golden

    codebook, df = request.param
    path = generate(codebook, df)
    return request.param, load_golden(path)


def _to_graph(graph_np) -> ProteinGraphBatch:
    return ProteinGraphBatch(**{k: jnp.asarray(v) for k, v in graph_np.items()})


@requires_reference
def test_variant_tokens_bit_exact(variant_golden):
    (codebook, df), (params, graph_np, feats, enc_ref, dec_ref) = variant_golden
    cfg = preset(codebook, df)
    graph = _to_graph(graph_np)

    out = vq3d.encode_and_quantize(
        params, cfg, graph, compute_usage=True, compute_distances=False,
        exact_aggregation=True,
    )
    np.testing.assert_array_equal(np.asarray(out["tokens"]), enc_ref["tokens"])
    np.testing.assert_array_equal(np.asarray(out["quantize"]), enc_ref["quantize"])
    np.testing.assert_array_equal(
        np.asarray(out["continuous_embedding"]), enc_ref["continuous_embedding"]
    )
    np.testing.assert_allclose(
        float(out["perplexity"]), float(enc_ref["perplexity"]), rtol=1e-6
    )


@requires_reference
def test_variant_tokens_fast_path(variant_golden):
    (codebook, df), (params, graph_np, feats, enc_ref, dec_ref) = variant_golden
    cfg = preset(codebook, df)
    graph = _to_graph(graph_np)

    out = vq3d.encode_and_quantize(params, cfg, graph, compute_usage=False)
    np.testing.assert_array_equal(np.asarray(out["tokens"]), enc_ref["tokens"])


@requires_reference
def test_variant_decode_masks(variant_golden):
    (codebook, df), (params, graph_np, feats, enc_ref, dec_ref) = variant_golden
    cfg = preset(codebook, df)

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
