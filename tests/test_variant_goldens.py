"""Reference-golden parity for the remaining released variants.

Round 1 pinned 432_df1 and 4096_df{1,2,4}; this closes the gap for **1728**
(full size) and **64000 df 1/2/4** so every row of the BASELINE config list has
a reference-pinned end-to-end parity test.  The 64k df 2/4 goldens run at a
reduced ``seq_max=64`` (overridden consistently on both sides): the reference
materializes a (B, N, K, D) distance tensor in its quantizer forward
(/root/reference/structure_tokenizer/model/quantize.py:227-239), which is
~0.8 GB per batch row at N=512 — so 64000_df1 additionally carries a
full-N (seq_max=512, B=1) golden pinning the flagship 64k encode at the
real sequence length, while df 2/4 stay at the cheap N=64 shape.
"""
import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.data.types import ProteinGraphBatch
from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import preset

# (codebook_size, df, seq_max override, batch, n_real)
VARIANTS = [
    (1728, 1, None, 2, 77),
    # Full-N 64k row (round-5): at B=1 the reference quantizer's
    # (B, N, K, D) intermediate is ~0.8 GB — practical on this host, so the
    # 64k encode is pinned against the reference AT N=512, not just N=64.
    (64000, 1, None, 1, 300),
    (64000, 1, 64, 1, 56),
    (64000, 2, 64, 1, 56),
    (64000, 4, 64, 1, 56),
]

IDS = [f"{size}_df{df}" + ("" if n is None else f"_n{n}") for size, df, n, *_ in VARIANTS]


@pytest.fixture(scope="module", params=VARIANTS, ids=IDS)
def golden(request):
    from gen_goldens import generate, load_golden

    size, df, seq_max, batch, n_real = request.param
    path = generate(size, df, batch=batch, n_real=n_real, seq_max=seq_max)
    return request.param, load_golden(path)


def _to_graph(graph_np) -> ProteinGraphBatch:
    return ProteinGraphBatch(**{k: jnp.asarray(v) for k, v in graph_np.items()})


@requires_reference
def test_encode_tokens_bit_exact(golden):
    (size, df, seq_max, *_), (params, graph_np, feats, enc_ref, dec_ref) = golden
    cfg = preset(size, df, seq_max=seq_max or 512)
    graph = _to_graph(graph_np)

    out = vq3d.encode_and_quantize(
        params, cfg, graph, compute_usage=True, exact_aggregation=True
    )
    np.testing.assert_array_equal(np.asarray(out["tokens"]), enc_ref["tokens"])
    np.testing.assert_array_equal(np.asarray(out["quantize"]), enc_ref["quantize"])
    np.testing.assert_array_equal(
        np.asarray(out["continuous_embedding"]), enc_ref["continuous_embedding"]
    )
    np.testing.assert_allclose(
        float(out["perplexity"]), float(enc_ref["perplexity"]), rtol=1e-6
    )
    assert int(np.asarray(out["tokens"]).max()) < size


@requires_reference
def test_fast_aggregation_tokens_match(golden):
    """The TPU-fast reshape-sum aggregation keeps token ids identical for
    every codebook/df variant (FSQ rounds away the f32-ulp drift)."""
    (size, df, seq_max, *_), (params, graph_np, feats, enc_ref, dec_ref) = golden
    cfg = preset(size, df, seq_max=seq_max or 512)
    graph = _to_graph(graph_np)

    out = vq3d.encode_and_quantize(params, cfg, graph, compute_usage=False)
    np.testing.assert_array_equal(np.asarray(out["tokens"]), enc_ref["tokens"])


@requires_reference
def test_distances_match_reference(golden):
    """Our O(BNKD)-free diagnostics path reproduces the reference's masked
    distance tensor and soft_proba at f32 (quantize.py:227-239 semantics)."""
    (size, df, seq_max, *_), (params, graph_np, feats, enc_ref, dec_ref) = golden
    cfg = preset(size, df, seq_max=seq_max or 512)
    graph = _to_graph(graph_np)

    out = vq3d.encode_and_quantize(
        params, cfg, graph,
        compute_usage=False, compute_distances=True, exact_aggregation=True,
    )
    if "distances_sub" in enc_ref:
        # Committed fixtures store the (B, N, K) diagnostics at a
        # deterministic row/code subsample (gen_goldens.slim_diagnostics).
        rows, codes = enc_ref["sub_rows"], enc_ref["sub_codes"]
        ours_d = np.asarray(out["distances"])[:, rows][:, :, codes]
        ours_p = np.asarray(out["soft_proba"])[:, rows][:, :, codes]
        ref_d, ref_p = enc_ref["distances_sub"], enc_ref["soft_proba_sub"]
    elif "distances" in enc_ref:
        ours_d, ours_p = np.asarray(out["distances"]), np.asarray(out["soft_proba"])
        ref_d, ref_p = enc_ref["distances"], enc_ref["soft_proba"]
    else:
        pytest.skip("fixture predates distance capture")
    np.testing.assert_allclose(ours_d, ref_d, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(ours_p, ref_p, rtol=1e-5, atol=1e-7)


@requires_reference
def test_token_codec_roundtrip_vs_reference(golden):
    """indexes_to_codes inverts the reference's token ids to its quantized
    codes (the decode-side entry, quantize.py:122-139 semantics)."""
    (size, df, seq_max, *_), (params, graph_np, feats, enc_ref, dec_ref) = golden
    cfg = preset(size, df, seq_max=seq_max or 512)
    codes = np.asarray(vq3d.indexes_to_codes(cfg, jnp.asarray(enc_ref["tokens"])))
    mask = graph_np["tokens_mask"][..., :1]  # (B, T, 1)
    np.testing.assert_array_equal(codes * mask, enc_ref["quantize"] * mask)


@requires_reference
def test_decode_masks_and_first_iteration(golden):
    """Decode path sanity for each variant: final atom mask exact, first
    refinement iteration tight (full-trajectory equivalence with random
    weights is chaotic — see test_model_parity.py for rationale)."""
    (size, df, seq_max, *_), (params, graph_np, feats, enc_ref, dec_ref) = golden
    cfg = preset(size, df, seq_max=seq_max or 512)

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
    valid = graph_np["nodes_mask"][..., 0].astype(bool)
    ours_traj0 = np.asarray(out["traj"])[0]
    ref_traj0 = dec_ref["traj"][:, 0]
    np.testing.assert_allclose(ours_traj0[valid], ref_traj0[valid], atol=5e-2)
