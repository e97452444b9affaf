"""Length-bucketed tokenization: bit-exact tokens, smaller padded shapes.

The reference pads every graph to seq_max=512 (inference_runner.py:191-216);
CASP14 averages 181 residues, so ~65% of the encode FLOPs/bytes there are
padding.  The runner's length buckets pad each batch only to the smallest
bucket that fits its longest chain.  Exactness hinges on one invariant,
pinned here at three levels: positional-encoding bases stay bound to
seq_max, every masked op contributes exactly zero for pad positions, so
valid rows are bit-identical under any padding.
"""
import dataclasses
import glob

import numpy as np
import pytest

import jax

from protein_structure_tokenizer_tpu.data.featurize import (
    FeaturizeConfig,
    make_graph_from_pdb,
    preprocess_sample,
)
from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import preset, tiny_preset
from protein_structure_tokenizer_tpu.runtime.runner import (
    InferenceRunner,
    collate_graphs,
    default_length_buckets,
    pad_tokens_axis,
)

CASP14 = sorted(glob.glob("/root/reference/casp14_pdbs/*.pdb"))


def test_default_buckets():
    assert default_length_buckets(preset(4096, 1)) == (128, 256, 384, 512)
    assert default_length_buckets(preset(4096, 2)) == (128, 256, 384, 512)
    assert default_length_buckets(preset(4096, 4, seq_max=1024)) == (
        256, 512, 768, 1024,
    )
    # degenerate tiny config collapses to one bucket -> disabled
    assert default_length_buckets(tiny_preset(seq_max=2, k=2, downsampling=2)) is None
    assert default_length_buckets(tiny_preset(seq_max=4, k=2, downsampling=2)) == (2, 4)


def test_invalid_custom_buckets_rejected():
    cfg = preset(4096, 2)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="length_buckets"):
        InferenceRunner(cfg, params, length_buckets=(255, 512))  # not df-divisible
    with pytest.raises(ValueError, match="length_buckets"):
        InferenceRunner(cfg, params, length_buckets=(600,))  # > seq_max


def test_exact_aggregation_disables_buckets():
    cfg = tiny_preset(seq_max=16, k=4, downsampling=2, dim=16)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    assert InferenceRunner(cfg, params, exact_aggregation=True).length_buckets is None


def _encode_tokens(cfg, params, graph):
    batch = pad_tokens_axis(
        collate_graphs([dataclasses.asdict(graph)]), cfg.down_sampler.max_out_len
    )
    out = vq3d.encode_and_quantize(params, cfg, batch)
    nv = int(np.asarray(batch.tokens_mask).sum())
    return np.asarray(out["tokens"])[0, :nv]


def test_model_level_padding_invariance_tiny():
    """Tokens from an 8-padded graph == 16-padded graph (tiny model)."""
    import sys

    sys.path.insert(0, "tests")
    from test_train import synthetic_sample

    cfg = tiny_preset(seq_max=16, k=4, downsampling=2, dim=16)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    sample = synthetic_sample(6, seed=0)
    toks = {}
    for pad in (8, 16):
        fc = FeaturizeConfig(num_neighbor=4, downsampling_ratio=2,
                             padding_num_residue=pad, crop_index=pad)
        graph, _ = preprocess_sample(sample, fc)
        toks[pad] = _encode_tokens(cfg, params, graph)
    np.testing.assert_array_equal(toks[8], toks[16])


@pytest.mark.skipif(not CASP14, reason="corpus not mounted")
def test_full_size_bitwise_invariance():
    """Full 4k_df_1 model on a real chain: continuous embeddings (pre-FSQ)
    are BITWISE equal between 256- and 512-padded graphs."""
    cfg = preset(4096, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    path = next(p for p in CASP14 if "T1029" in p)  # 125 residues
    embs = {}
    for pad in (128, 256, 512):
        graph = make_graph_from_pdb(path, padding_num_residue=pad)
        batch = pad_tokens_axis(
            collate_graphs([dataclasses.asdict(graph)]),
            cfg.down_sampler.max_out_len,
        )
        proj, _ = jax.jit(lambda p, b: vq3d.encode(p, cfg, b))(params, batch)
        nv = int(np.asarray(batch.tokens_mask).sum())
        embs[pad] = np.asarray(proj)[0, :nv]
    np.testing.assert_array_equal(embs[128], embs[512])
    np.testing.assert_array_equal(embs[256], embs[512])


@pytest.mark.skipif(len(CASP14) < 4, reason="corpus not mounted")
def test_runner_buckets_match_unbucketed(tmp_path):
    """End-to-end: bucketed tokenize (default) == unbucketed tokenize,
    token-for-token, including the sorted/bucketed batch composition."""
    cfg = preset(4096, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    # Two short chains keep the CPU cost down; different lengths force a
    # real sort + a sub-512 bucket.
    from protein_structure_tokenizer_tpu.data.sample import parse_pdb_file

    by_len = sorted(CASP14, key=lambda p: parse_pdb_file(p).nb_residues)
    paths = [by_len[0], by_len[3]]

    bucketed = InferenceRunner(cfg, params)
    assert bucketed.length_buckets == (128, 256, 384, 512)
    plain = InferenceRunner(cfg, params, length_buckets=None)

    out_b = bucketed.tokenize(paths, batch_size_per_device=1)
    out_p = plain.tokenize(paths, batch_size_per_device=1)
    assert set(out_b) == set(out_p)
    for name in out_p:
        np.testing.assert_array_equal(out_b[name], out_p[name])


@pytest.mark.skipif(not CASP14, reason="corpus not mounted")
@pytest.mark.slow
def test_runner_decode_buckets_match_unbucketed(tmp_path):
    """Decode side: bucketed node/token padding (quadratic pair-track win).

    Unlike the token path (bit-exact), decoded COORDINATES carry reduction-
    order noise between shapes: XLA blocks the attention/matmul reductions
    over the padded key axis differently per N, so the same valid terms
    accumulate in a different order (~1e-4 relative, < 0.001 A — far below
    the fast-vs-exact IPA difference already documented).  Masks must still
    be identical and coordinates tightly close."""
    cfg = preset(4096, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    files = []
    for i, n in enumerate((70, 115)):
        path = tmp_path / f"s{i}_tokens.npy"
        np.save(path, rng.randint(0, 4096, size=(1, n)).astype(np.uint32))
        files.append(str(path))

    bucketed = InferenceRunner(cfg, params)
    plain = InferenceRunner(cfg, params, length_buckets=None)
    out_b = bucketed.decode_tokens(files, batch_size_per_device=1)
    out_p = plain.decode_tokens(files, batch_size_per_device=1)
    assert set(out_b) == set(out_p)
    for name in out_p:
        np.testing.assert_allclose(
            out_b[name].atom_positions, out_p[name].atom_positions,
            rtol=1e-3, atol=1e-3,
        )
        np.testing.assert_array_equal(out_b[name].atom_mask, out_p[name].atom_mask)
