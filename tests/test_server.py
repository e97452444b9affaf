"""Serving stack (runtime/server.py): continuous micro-batching + HTTP API.

Runs the whole thing in-process on the CPU mesh with random weights at a tiny
preset; verifies the server's answers equal the batch runner's for the same
inputs (the batcher's padding/slicing must be invisible)."""
import json
import threading
from concurrent.futures import ThreadPoolExecutor
from http.client import HTTPConnection

import numpy as np
import pytest

import jax

from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import tiny_preset
from protein_structure_tokenizer_tpu.runtime.runner import InferenceRunner
from protein_structure_tokenizer_tpu.runtime.server import (
    BatchingEngine,
    InferenceServer,
)

from test_train import synthetic_sample

SEQ_MAX, K, DF = 16, 4, 2


def sample_pdb_text(seed: int, n_res: int = 12) -> str:
    """A synthetic backbone as PDB text (via our writer)."""
    from protein_structure_tokenizer_tpu.data.protein_io import Protein, to_pdb

    s = synthetic_sample(n_res, seed=seed)
    prot = Protein.from_atom37_rep(
        atom37_positions=s.atom37_positions,
        atom37_gt_exists=s.atom37_gt_exists,
        atom37_atom_exists=s.atom37_atom_exists,
        aatype=s.aatype,
    )
    return to_pdb(prot)


@pytest.fixture(scope="module")
def served():
    cfg = tiny_preset(seq_max=SEQ_MAX, k=K, downsampling=DF, dim=16)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    runner = InferenceRunner(cfg, params)
    engine = BatchingEngine(runner, max_batch=8, max_wait_ms=5.0)
    server = InferenceServer(engine, port=0)  # ephemeral port
    server.start_background()
    yield cfg, runner, engine, server
    server.close()


def _post(port: int, path: str, body: bytes):
    conn = HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=body)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def _get(port: int, path: str):
    conn = HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_healthz(served):
    *_, server = served
    status, data = _get(server.port, "/healthz")
    assert status == 200 and json.loads(data) == {"status": "ok"}


def test_tokenize_matches_runner(served, tmp_path):
    cfg, runner, engine, server = served
    pdb_text = sample_pdb_text(seed=0)
    status, data = _post(server.port, "/tokenize", pdb_text.encode())
    assert status == 200, data
    served_tokens = np.asarray(json.loads(data)["tokens"], np.uint32)

    pdb_path = tmp_path / "s0.pdb"
    pdb_path.write_text(pdb_text)
    ref = runner.tokenize([str(pdb_path)], batch_size_per_device=1)
    np.testing.assert_array_equal(served_tokens, ref["s0"].reshape(-1))


def test_decode_roundtrip(served):
    cfg, runner, engine, server = served
    pdb_text = sample_pdb_text(seed=1)
    status, data = _post(server.port, "/tokenize", pdb_text.encode())
    tokens = json.loads(data)["tokens"]
    status, pdb_out = _post(
        server.port, "/decode", json.dumps({"tokens": tokens}).encode()
    )
    assert status == 200, pdb_out
    text = pdb_out.decode()
    assert text.startswith("MODEL")
    # df=2: 6 tokens -> 12 residues, 4 backbone atoms each
    n_atoms = sum(1 for line in text.splitlines() if line.startswith("ATOM"))
    assert n_atoms == len(tokens) * DF * 4


def test_concurrent_requests_share_batches(served):
    cfg, runner, engine, server = served
    # Different lengths guarantee distinct token streams (6/7/8 tokens).
    pdbs = [sample_pdb_text(seed=i, n_res=12 + 2 * (i % 3)).encode()
            for i in range(6)]
    with engine._lock:
        batches_before = engine.stats.batches
        requests_before = engine.stats.requests
    with ThreadPoolExecutor(6) as pool:
        results = list(
            pool.map(lambda b: _post(server.port, "/tokenize", b), pdbs)
        )
    assert all(status == 200 for status, _ in results)
    # Different inputs produce (at least some) different token streams.
    streams = {tuple(json.loads(d)["tokens"]) for _, d in results}
    assert len(streams) > 1
    with engine._lock:
        n_batches = engine.stats.batches - batches_before
        n_requests = engine.stats.requests - requests_before
    assert n_requests == 6
    # The micro-batcher coalesced at least some concurrent requests.
    assert n_batches < n_requests


def test_batched_equals_solo(served, tmp_path):
    """Rows sliced out of a shared padded dispatch == a solo dispatch."""
    cfg, runner, engine, server = served
    texts = [sample_pdb_text(seed=10 + i) for i in range(3)]
    with ThreadPoolExecutor(3) as pool:
        batched = list(
            pool.map(
                lambda t: json.loads(
                    _post(server.port, "/tokenize", t.encode())[1]
                )["tokens"],
                texts,
            )
        )
    solo = [
        json.loads(_post(server.port, "/tokenize", t.encode())[1])["tokens"]
        for t in texts
    ]
    assert batched == solo


def test_invalid_request_isolated(served):
    *_, server = served
    status, data = _post(server.port, "/tokenize", b"garbage not a pdb")
    assert status == 400
    assert "error" in json.loads(data)
    # Server still healthy afterwards.
    status, _ = _get(server.port, "/healthz")
    assert status == 200


def test_stats_endpoint(served):
    *_, server = served
    # Self-sufficient under xdist: earlier tests in this module may have run
    # on a different worker, so issue at least one request ourselves.
    _post(server.port, "/tokenize", sample_pdb_text(seed=99).encode())
    status, data = _get(server.port, "/stats")
    assert status == 200
    snap = json.loads(data)
    assert snap["requests"] >= 1
    assert snap["latency_ms"]["p50"] is not None


def test_generate_endpoint(served):
    """POST /generate with server-attached GPT weights (tiny config)."""
    from protein_structure_tokenizer_tpu.lm import gpt

    cfg, runner, engine, server = served
    gcfg = gpt.GptConfig(
        vocab_size=20, embed_dim=32, ffn_embed_dim=64, num_heads=4,
        num_layers=1, rope_dimensions=8, max_position_embeddings=10,
        bos_token_id=17, eos_token_id=18, pad_token_id=19,
    )
    server.gpt_config = gcfg
    server.gpt_params = gpt.init(jax.random.PRNGKey(0), gcfg)
    try:
        status, data = _post(
            server.port, "/generate",
            json.dumps({"num_sequences": 2, "num_tokens": 8, "seed": 7}).encode(),
        )
        assert status == 200, data
        out = json.loads(data)
        assert len(out["tokens"]) == 2
        assert out["seed"] == 7
        for row in out["tokens"]:
            assert all(0 <= t < gcfg.vocab_size for t in row)
            assert gcfg.bos_token_id not in row and gcfg.eos_token_id not in row
    finally:
        server.gpt_params = server.gpt_config = None


def test_generate_without_weights_rejected(served):
    *_, server = served
    status, data = _post(server.port, "/generate", b"{}")
    assert status == 400
    assert "GPT weights" in json.loads(data)["error"]


def test_mixed_bucket_window_matches_unbucketed():
    """Requests landing in one scheduler window but belonging to DIFFERENT
    length buckets are dispatched as separate static-shape groups, each
    request still getting its own correct answer."""
    from concurrent.futures import ThreadPoolExecutor as _TPE

    cfg = tiny_preset(seq_max=SEQ_MAX, k=K, downsampling=DF, dim=16)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)

    bucketed = BatchingEngine(
        InferenceRunner(cfg, params, length_buckets=(8, SEQ_MAX)),
        max_batch=8, max_wait_ms=50.0,
    )
    plain = BatchingEngine(
        InferenceRunner(cfg, params, length_buckets=None),
        max_batch=8, max_wait_ms=5.0,
    )
    try:
        pdbs = [sample_pdb_text(seed=i, n_res=n)
                for i, n in enumerate((6, 6, 14, 14))]
        with _TPE(4) as pool:
            got = list(pool.map(bucketed.tokenize_pdb_string, pdbs))
        expected = [plain.tokenize_pdb_string(p) for p in pdbs]
        for g, e in zip(got, expected):
            np.testing.assert_array_equal(g, e)
    finally:
        bucketed.close()
        plain.close()


def test_generate_endpoint_int8(served):
    """POST /generate on the int8 serving recipe (cli.serve --gpt_int8):
    int8 weights + int8 KV cache, int8_kv threaded via sampling_defaults."""
    import jax
    import jax.numpy as jnp

    from protein_structure_tokenizer_tpu.lm import gpt, quant
    from protein_structure_tokenizer_tpu.runtime.precision import cast_floats

    cfg, runner, engine, server = served
    gcfg = gpt.GptConfig(
        vocab_size=20, embed_dim=32, ffn_embed_dim=64, num_heads=4,
        num_layers=1, rope_dimensions=8, max_position_embeddings=10,
        bos_token_id=17, eos_token_id=18, pad_token_id=19,
    )
    server.gpt_config = gcfg
    server.gpt_params = quant.quantize_gpt_params_int8(
        gpt.fuse_qkv_params(
            cast_floats(gpt.init(jax.random.PRNGKey(0), gcfg), jnp.bfloat16),
            gcfg,
        )
    )
    server.sampling_defaults = {"int8_kv": True}
    try:
        status, data = _post(
            server.port, "/generate",
            json.dumps({"num_sequences": 2, "num_tokens": 8, "seed": 7}).encode(),
        )
        assert status == 200, data
        out = json.loads(data)
        assert len(out["tokens"]) == 2
        for row in out["tokens"]:
            assert all(0 <= t < gcfg.vocab_size for t in row)
    finally:
        server.gpt_params = server.gpt_config = None
        server.sampling_defaults = {}


def test_generate_endpoint_prompted(served):
    """POST /generate with a prompt: every returned row continues the
    forced prefix (prefix completion)."""
    from protein_structure_tokenizer_tpu.lm import gpt

    cfg, runner, engine, server = served
    gcfg = gpt.GptConfig(
        vocab_size=20, embed_dim=32, ffn_embed_dim=64, num_heads=4,
        num_layers=1, rope_dimensions=8, max_position_embeddings=12,
        bos_token_id=17, eos_token_id=18, pad_token_id=19,
    )
    server.gpt_config = gcfg
    server.gpt_params = gpt.init(jax.random.PRNGKey(0), gcfg)
    try:
        status, data = _post(
            server.port, "/generate",
            json.dumps({
                "num_sequences": 2, "num_tokens": 10, "seed": 3,
                "prompt": [4, 9, 2], "stop_at_eos": False,
            }).encode(),
        )
        assert status == 200, data
        out = json.loads(data)
        assert len(out["tokens"]) == 2
        for row in out["tokens"]:
            assert row[:3] == [4, 9, 2]  # stripped rows keep the prompt
    finally:
        server.gpt_params = server.gpt_config = None


def test_score_endpoint(served):
    """POST /score: per-row LM log-likelihood / perplexity (lm.scoring)."""
    from protein_structure_tokenizer_tpu.lm import gpt

    cfg, runner, engine, server = served
    gcfg = gpt.GptConfig(
        vocab_size=20, embed_dim=32, ffn_embed_dim=64, num_heads=4,
        num_layers=1, rope_dimensions=8, max_position_embeddings=12,
        bos_token_id=17, eos_token_id=18, pad_token_id=19,
    )
    server.gpt_config = gcfg
    server.gpt_params = gpt.init(jax.random.PRNGKey(0), gcfg)
    try:
        status, data = _post(
            server.port, "/score",
            json.dumps({"sequences": [[3, 8, 1], [5]]}).encode(),
        )
        assert status == 200, data
        out = json.loads(data)
        assert len(out["log_likelihood"]) == 2
        assert out["num_scored"] == [4, 2]
        assert all(v < 0 for v in out["log_likelihood"])
        assert all(v > 1 for v in out["perplexity"])

        # missing payload rejected per-request
        status, data = _post(server.port, "/score", b"{}")
        assert status == 400
    finally:
        server.gpt_params = server.gpt_config = None
