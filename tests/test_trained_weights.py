"""Regression tests against the COMMITTED trained artifacts (round 5).

Every other quality/precision test in this suite runs random weights; these
run the small tokenizer + GPT actually trained on CASP14 crops by
cli/train.py / cli/train_lm.py on the TPU (artifacts/trained/), pinning:

  * the trained tokenizer still loads through the CLI weights path and
    emits a LIVE codebook (regression for the round-5 finding that an
    unconstrained overfit collapses to ONE code and memorizes chains by
    length — fixed-length crops force the codes to carry information),
  * int8 quantization error measured at TRAINED weights (the random-weight
    KL bound in test_gpt.py is a heuristic worst case; this is the
    distribution-meaningful one): logits KL and decisive-token agreement.

Skipped wholesale when the artifacts are absent (they are committed, so
this only happens on a stripped checkout).
"""
import glob
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACTS = os.path.join(REPO, "artifacts", "trained")
TOKENIZER = os.path.join(ARTIFACTS, "tokenizer_4096_df1.npz")
GPT = os.path.join(ARTIFACTS, "gpt_tiny.npz")
CROPS = os.path.join(REPO, "artifacts", "eval_crops_heldin")
CASP14 = "/root/reference/casp14_pdbs"
HELDOUT = ("T1024", "T1037", "T1079", "T1030")


def _ensure_crops() -> bool:
    """The 96-residue eval crops are derived data — regenerate from the
    CASP14 corpus (tools/crop_pdbs.py) instead of committing PDB copies."""
    if glob.glob(os.path.join(CROPS, "*.pdb")):
        return True
    if not os.path.isdir(CASP14):
        return False
    import shutil
    import sys
    import tempfile

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import crop_pdbs

    with tempfile.TemporaryDirectory() as src:
        for f in glob.glob(os.path.join(CASP14, "*.pdb")):
            stem = os.path.splitext(os.path.basename(f))[0]
            if stem not in HELDOUT:
                shutil.copy(f, src)
        crop_pdbs.main(["--pdb_dir", src, "--out", CROPS, "--crop", "96"])
    return True


@pytest.mark.skipif(not os.path.exists(TOKENIZER), reason="trained artifacts absent")
def test_trained_tokenizer_live_codebook():
    from protein_structure_tokenizer_tpu.data.featurize import make_graph_from_pdb
    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.models.config import preset
    from protein_structure_tokenizer_tpu.runtime import checkpoints
    from protein_structure_tokenizer_tpu.runtime.dataset import collate_features

    cfg = preset(4096, 1, seq_max=96)
    template = jax.tree_util.tree_map(
        np.asarray, vq3d.init(jax.random.PRNGKey(0), cfg)
    )
    params = checkpoints.load_weights(TOKENIZER, template)

    if not _ensure_crops():
        pytest.skip("eval crops absent and CASP14 corpus not mounted")
    pdbs = sorted(glob.glob(os.path.join(CROPS, "*.pdb")))[:4]
    assert pdbs, "eval crops missing"
    import dataclasses

    graphs = []
    for p in pdbs:
        g = make_graph_from_pdb(
            p, num_neighbor=cfg.data.graph_max_neighbor,
            downsampling_ratio=cfg.data.downsampling_ratio,
            padding_num_residue=cfg.data.seq_max_size,
        )
        graphs.append(dataclasses.asdict(g))
    from protein_structure_tokenizer_tpu.runtime.runner import collate_graphs

    batch = collate_graphs(graphs)
    out = vq3d.encode_and_quantize(params, cfg, batch, compute_usage=False)
    tokens = np.asarray(out["tokens"])
    mask = np.asarray(batch.tokens_mask)[..., 0].astype(bool)
    used = np.unique(tokens[mask])
    # A live codebook: many distinct codes across 4 chains (the collapsed
    # run used exactly 2 over the whole corpus).
    assert used.size >= 16, f"codebook nearly collapsed: {used.size} codes"
    # Rows must differ between chains (tokens carry structure, not length).
    t0, t1 = tokens[0][mask[0]], tokens[1][mask[1]]
    n = min(t0.size, t1.size)
    assert (t0[:n] != t1[:n]).mean() > 0.2


@pytest.mark.skipif(not os.path.exists(GPT), reason="trained artifacts absent")
def test_trained_gpt_int8_agreement():
    """int8 weight quantization at TRAINED weights: logits stay close to
    f32 (KL) and the argmax token agrees almost everywhere.  Bounds are 2x
    the values measured at artifact-creation time (see
    docs/TRAINED_QUALITY.md); random-weight KL in test_gpt.py is ~an order
    looser."""
    from protein_structure_tokenizer_tpu.lm import gpt, quant
    from protein_structure_tokenizer_tpu.runtime import checkpoints

    with open(GPT[:-4] + ".config.json") as f:
        cfg = gpt.GptConfig(**json.load(f))
    template = jax.tree_util.tree_map(
        np.asarray, gpt.init(jax.random.PRNGKey(0), cfg)
    )
    params = checkpoints.load_params(GPT, template)

    rows = [
        np.load(fp).reshape(-1).astype(np.int32)
        for fp in sorted(glob.glob(os.path.join(ARTIFACTS, "quality", "tokens",
                                                "*_tokens.npy")))[:8]
    ]
    if not rows:
        pytest.skip("token artifacts absent")
    from protein_structure_tokenizer_tpu.lm import scoring

    tokens = jnp.asarray(scoring.frame_rows(rows, cfg))

    logits_f32 = gpt.forward(params, cfg, tokens[:, :-1])["logits"]
    qparams = quant.quantize_gpt_params_int8(params)
    logits_i8 = gpt.forward(qparams, cfg, tokens[:, :-1])["logits"]

    lp = jax.nn.log_softmax(logits_f32.astype(jnp.float32), axis=-1)
    lq = jax.nn.log_softmax(logits_i8.astype(jnp.float32), axis=-1)
    mask = np.asarray(tokens[:, :-1] != cfg.pad_token_id)
    kl = np.asarray(jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1))[mask]
    agree = np.asarray(
        jnp.argmax(logits_f32, axis=-1) == jnp.argmax(logits_i8, axis=-1)
    )[mask]
    # Measured at artifact creation (docs/TRAINED_QUALITY.md): mean KL
    # 5.4e-6, p99 5.4e-7, max 6.2e-3, argmax agreement 1.0 — three orders
    # tighter than the random-weight bound (3e-2, test_gpt.py).  Asserted
    # with generous headroom for backend-to-backend float drift.
    assert float(kl.mean()) < 1e-4, float(kl.mean())
    assert float(np.percentile(kl, 99)) < 1e-3, float(np.percentile(kl, 99))
    assert float(agree.mean()) > 0.999, float(agree.mean())
