"""LM scoring (lm.scoring): framing, likelihoods, CLI."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.lm import gpt, scoring

SMALL = gpt.GptConfig(
    vocab_size=35,
    embed_dim=16,
    ffn_embed_dim=32,
    num_heads=2,
    num_layers=2,
    rope_dimensions=4,
    max_position_embeddings=18,
    bos_token_id=32,
    eos_token_id=33,
    pad_token_id=34,
)


def test_frame_rows():
    rows = [np.array([1, 2, 3]), np.array([7])]
    framed = scoring.frame_rows(rows, SMALL)
    assert framed.shape == (2, 5)  # longest + BOS + EOS
    np.testing.assert_array_equal(framed[0], [32, 1, 2, 3, 33])
    np.testing.assert_array_equal(framed[1], [32, 7, 33, 34, 34])
    # rows longer than the block truncate and still end in one EOS
    long = scoring.frame_rows([np.arange(30) % 32], SMALL)
    assert long.shape[1] == SMALL.max_position_embeddings
    assert long[0, -1] == SMALL.eos_token_id


def test_score_matches_manual():
    params = gpt.init(jax.random.PRNGKey(0), SMALL)
    framed = jnp.asarray(scoring.frame_rows(
        [np.array([4, 9, 2, 11]), np.array([5])], SMALL
    ))
    out = scoring.score_sequences(params, SMALL, framed)

    # manual teacher-forced log-likelihood from the raw forward
    logits = np.asarray(
        gpt.forward(params, SMALL, framed[:, :-1])["logits"], np.float64
    )
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    targets = np.asarray(framed[:, 1:])
    expect = []
    for b in range(2):
        ll = 0.0
        n = 0
        for t, tok in enumerate(targets[b]):
            if tok == SMALL.pad_token_id:
                continue
            ll += logp[b, t, tok]
            n += 1
        expect.append((ll, n))
    np.testing.assert_allclose(
        np.asarray(out["log_likelihood"]), [e[0] for e in expect], rtol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out["num_scored"]), [float(e[1]) for e in expect]
    )
    # row 0 scores its 4 tokens + EOS; row 1 its 1 token + EOS
    assert out["num_scored"][0] == 5 and out["num_scored"][1] == 2
    np.testing.assert_allclose(
        np.asarray(out["perplexity"]),
        [np.exp(-e[0] / e[1]) for e in expect], rtol=2e-5,
    )


def test_score_cli(tmp_path):
    from protein_structure_tokenizer_tpu.cli import score_tokens

    tok_dir = tmp_path / "toks"
    tok_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        np.save(tok_dir / f"tokens_{i}.npy", rng.randint(0, 432, size=4 + i))
    out = tmp_path / "scores.json"
    score_tokens.main([
        "--backend", "cpu", "--tokens_dir", str(tok_dir),
        "--output", str(out), "--codebook_size", "432",
        "--num_layers", "2", "--embed_dim", "32", "--num_heads", "4",
        "--block_size", "16", "--batch_size", "2",
    ])
    report = json.loads(out.read_text())
    assert set(report) == {f"tokens_{i}.npy" for i in range(3)}
    for entry in report.values():
        assert entry["log_likelihood"] < 0
        assert entry["perplexity"] > 1
        assert entry["num_scored"] >= 5
