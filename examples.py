#!/usr/bin/env python3
"""Runnable examples for the data pipeline and tokenizer API.

Counterpart of /root/reference/examples.py:20-279 (5 scenarios: basic file
processing, custom config, PDB-string input, batch processing, info-only),
plus a tokenizer round-trip on top of the preprocessed graph.

Run:  python examples.py            # all examples
      python examples.py 3          # just example 3
"""
import glob
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from protein_structure_tokenizer_tpu.data.featurize import FeaturizeConfig
from protein_structure_tokenizer_tpu.data.pipeline import DataPipeline, PipelineConfig

CASP14 = "/root/reference/casp14_pdbs"
OUT = tempfile.mkdtemp(prefix="pst_examples_")


def _sample_pdb() -> str:
    hits = sorted(glob.glob(os.path.join(CASP14, "*.pdb")))
    if not hits:
        raise SystemExit(f"no sample PDBs under {CASP14}")
    return hits[0]


def example_1_basic_usage():
    """Process one PDB file end-to-end and persist the padded graph."""
    pipeline = DataPipeline()
    pdb = _sample_pdb()
    out = os.path.join(OUT, "example1.npz")
    graph, features = pipeline.process_single(pdb, out)
    print(f"[1] {os.path.basename(pdb)}: {int(graph.nodes_mask.sum())} residues, "
          f"{int(graph.tokens_mask.sum())} tokens -> {out}")
    graph2, _ = DataPipeline.load(out)
    assert np.array_equal(graph.edge_features, graph2.edge_features)


def example_2_custom_config():
    """Tighter limits + smaller k-NN graph via PipelineConfig."""
    cfg = PipelineConfig(
        featurize=FeaturizeConfig(padding_num_residue=256, num_neighbor=20),
        min_number_valid_residues=20,
        max_number_residues=256,
    )
    pipeline = DataPipeline(cfg)
    for pdb in sorted(glob.glob(os.path.join(CASP14, "*.pdb")))[:5]:
        try:
            graph, _ = pipeline.process_single(pdb)
            print(f"[2] {os.path.basename(pdb)}: OK, edges={graph.senders.shape[0]}")
            break
        except ValueError as exc:
            print(f"[2] {os.path.basename(pdb)}: rejected ({exc})")


def example_3_pdb_string():
    """Featurize directly from an in-memory PDB string."""
    with open(_sample_pdb()) as f:
        pdb_string = f.read()
    pipeline = DataPipeline()
    sample = pipeline.load_from_pdb_string(pdb_string)
    print(f"[3] parsed from string: {sample.nb_residues} residues, "
          f"chain={sample.chain_id}")


def example_4_batch_processing():
    """Process a directory of PDBs; failures are logged, not fatal."""
    pipeline = DataPipeline()
    pdbs = sorted(glob.glob(os.path.join(CASP14, "*.pdb")))[:4]
    results = pipeline.process_batch(pdbs, os.path.join(OUT, "batch"))
    ok = sum(v is not None for v in results.values())
    print(f"[4] batch: {ok}/{len(results)} processed -> {OUT}/batch")


def example_5_info_only():
    """Inspect a sample without featurizing."""
    pipeline = DataPipeline()
    sample = pipeline.load_from_pdb_file(_sample_pdb())
    info = pipeline.info(sample)
    print(f"[5] info: {info}")


def example_6_tokenize_roundtrip():
    """Graph -> token ids -> codes with a randomly-initialized model."""
    import jax

    import protein_structure_tokenizer_tpu as pst
    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.runtime.runner import collate_graphs
    import dataclasses

    cfg, params = pst.load_tokenizer(4096, 1)
    pipeline = DataPipeline()
    graph, _ = pipeline.process_single(_sample_pdb())
    batch = collate_graphs([dataclasses.asdict(graph)])
    out = vq3d.encode_and_quantize(params, cfg, batch, compute_usage=False)
    n = int(batch.tokens_mask.sum())
    tokens = np.asarray(out["tokens"])[0, :n]
    codes = np.asarray(vq3d.indexes_to_codes(cfg, tokens[None]))
    print(f"[6] {n} tokens, ids in [{tokens.min()}, {tokens.max()}], "
          f"codes shape {codes.shape} (random weights)")


def example_7_lm_workflow():
    """The paper's full loop at toy scale: token files -> train a tiny GPT ->
    sample novel sequences -> decode them to structures (all random/toy
    weights; swap in real checkpoints for the released sizes)."""
    import dataclasses
    import tempfile

    import jax
    import jax.numpy as jnp

    import protein_structure_tokenizer_tpu as pst
    from protein_structure_tokenizer_tpu.lm import gpt, sampling
    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
    from protein_structure_tokenizer_tpu.runtime.train_lm import (
        LmTrainConfig,
        TokenSequenceDataset,
        init_train_state,
        make_train_step,
    )

    gcfg = dataclasses.replace(
        gpt.released_gpt_config(432),
        num_layers=2, embed_dim=32, ffn_embed_dim=128, num_heads=4,
        max_position_embeddings=16,
    )
    with tempfile.TemporaryDirectory() as d:
        rng = np.random.RandomState(0)
        for i in range(8):
            np.save(f"{d}/s{i}_tokens.npy", rng.randint(0, 432, size=10))
        ds = TokenSequenceDataset.from_dir(d, gcfg, block_size=16)

    mesh = mesh_lib.make_mesh()
    tcfg = LmTrainConfig(warmup_steps=1, total_steps=3)
    params, opt = init_train_state(jax.random.PRNGKey(0), gcfg, tcfg, mesh)
    step_fn, _ = make_train_step(gcfg, tcfg, mesh)
    stream = ds.batches(8)
    for _ in range(3):
        params, opt, metrics = step_fn(params, opt, mesh_lib.shard_batch(mesh, next(stream)))

    seqs = sampling.generate(
        params, gcfg, jax.random.PRNGKey(1), batch_size=2, num_tokens=16,
        method="top_p", top_p=0.9, temperature=0.8,
    )
    toks = sampling.strip_special_tokens(
        np.asarray(seqs)[0], gcfg.bos_token_id, gcfg.eos_token_id
    )
    toks = np.minimum(np.asarray(toks, np.uint32), 431)[None]

    cfg, vparams = pst.load_tokenizer(432, 1)
    if toks.shape[1] == 0:
        toks = np.zeros((1, 4), np.uint32)
    quantized = vq3d.indexes_to_codes(cfg, jnp.asarray(toks))
    n = toks.shape[1]
    pad = cfg.data.seq_max_size
    quantized = jnp.pad(quantized, ((0, 0), (0, pad - n), (0, 0)))
    nodes_mask = jnp.asarray((np.arange(pad) < n).astype(np.float32))[None, :, None]
    out = vq3d.decode_and_make_structure(
        vparams, cfg, quantized, nodes_mask, nodes_mask
    )
    coords = np.asarray(out["final_atom_positions"])[0, :n]
    print(f"[7] trained LM (loss {float(metrics['loss']):.2f}) -> sampled "
          f"{n} tokens -> decoded backbone {coords.shape} (toy weights)")


def example_8_serving():
    """Always-on serving: continuous micro-batching over HTTP
    (cli.serve wraps this; here in-process with random weights)."""
    import json
    from http.client import HTTPConnection

    import jax

    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.models.config import preset
    from protein_structure_tokenizer_tpu.runtime.runner import InferenceRunner
    from protein_structure_tokenizer_tpu.runtime.server import (
        BatchingEngine,
        InferenceServer,
    )

    cfg = preset(432, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    server = InferenceServer(
        BatchingEngine(InferenceRunner(cfg, params), max_batch=4), port=0
    )
    server.start_background()
    try:
        with open(_sample_pdb()) as f:
            pdb_text = f.read()
        conn = HTTPConnection("127.0.0.1", server.port, timeout=300)
        conn.request("POST", "/tokenize", body=pdb_text.encode())
        tokens = json.loads(conn.getresponse().read())["tokens"]
        print(f"served {len(tokens)} tokens: {tokens[:8]}...")
        conn.request("GET", "/stats")
        print("stats:", json.loads(conn.getresponse().read()))
        conn.close()
    finally:
        server.close()


def example_9_quantized_prompted_lm():
    """Production LM serving recipes: the int8 quantized sampling path
    (int8 matmul weights + int8 KV cache), prefix completion (condition on
    an existing token prefix), and LM scoring (rank sequences by model
    likelihood)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from protein_structure_tokenizer_tpu.lm import gpt, quant, sampling, scoring
    from protein_structure_tokenizer_tpu.runtime.precision import cast_floats

    gcfg = dataclasses.replace(
        gpt.released_gpt_config(432),
        num_layers=2, embed_dim=32, ffn_embed_dim=128, num_heads=4,
        max_position_embeddings=16,
    )
    params = gpt.init(jax.random.PRNGKey(0), gcfg)

    # int8 serving transform: bf16 activations, fused qkv, int8 weights
    # (cli.gpt_generation --int8 --int8_kv / cli.serve --gpt_int8)
    qparams = quant.quantize_gpt_params_int8(
        gpt.fuse_qkv_params(cast_floats(params, jnp.bfloat16), gcfg)
    )

    # prefix completion: every row continues BOS + prompt
    prompt = jnp.asarray([[5, 17, 101]], jnp.int32)
    seqs = sampling.generate(
        qparams, gcfg, jax.random.PRNGKey(3), batch_size=1, num_tokens=12,
        method="top_k", k=8, temperature=0.8, prompt=prompt, int8_kv=True,
    )
    row = np.asarray(seqs)[0]
    assert (row[1:4] == [5, 17, 101]).all()

    # score candidate sequences by LM likelihood (pst score / POST /score)
    framed = scoring.frame_rows(
        [row[1:8], np.asarray([2, 2, 2], np.int32)], gcfg
    )
    scores = scoring.score_sequences(qparams, gcfg, jnp.asarray(framed))
    ll = np.asarray(scores["log_likelihood"])
    print(f"[9] int8 prompted sample {row[:8].tolist()}..., "
          f"log-likelihoods {ll.round(1).tolist()} "
          f"(perplexity {np.asarray(scores['perplexity']).round(1).tolist()})")


def example_10_trained_weights():
    """Tokenize -> decode with the COMMITTED trained tokenizer
    (artifacts/trained/, docs/TRAINED_QUALITY.md): real reconstruction,
    not random-weight smoke.  Skips quietly if the artifacts are absent."""
    weights = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "artifacts", "trained", "tokenizer_4096_df1.npz",
    )
    if not os.path.exists(weights):
        print("[10] skipped: trained artifacts not present")
        return
    import dataclasses

    import jax

    from protein_structure_tokenizer_tpu.data.featurize import make_graph_from_pdb
    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.models.config import preset
    from protein_structure_tokenizer_tpu.runtime import checkpoints
    from protein_structure_tokenizer_tpu.runtime.runner import InferenceRunner, collate_graphs

    cfg = preset(4096, 1, seq_max=96)  # the artifact's training shape
    template = jax.tree_util.tree_map(
        np.asarray, vq3d.init(jax.random.PRNGKey(0), cfg)
    )
    params = checkpoints.load_weights(weights, template)
    # The artifact was trained at seq_max=96; pick a chain that fits.
    small = os.path.join(CASP14, "T1073.pdb")  # 59 residues
    graph = make_graph_from_pdb(
        small if os.path.exists(small) else _sample_pdb(),
        num_neighbor=cfg.data.graph_max_neighbor,
        downsampling_ratio=cfg.data.downsampling_ratio,
        padding_num_residue=cfg.data.seq_max_size,
    )
    batch = collate_graphs([dataclasses.asdict(graph)])
    out = vq3d.encode_and_quantize(params, cfg, batch, compute_usage=False)
    n = int(batch.tokens_mask.sum())
    tokens = np.asarray(out["tokens"])[0, :n]
    runner = InferenceRunner(cfg, params)
    ids = runner.pad_token_rows([tokens])
    _, dec = runner.dispatch_decode(ids)
    pos = np.asarray(dec["backbone_positions"])
    print(f"[10] trained weights: {n} tokens ({np.unique(tokens).size} distinct "
          f"codes), decoded backbone {pos.shape} finite={np.isfinite(pos).all()}")


EXAMPLES = [
    example_1_basic_usage,
    example_2_custom_config,
    example_3_pdb_string,
    example_4_batch_processing,
    example_5_info_only,
    example_6_tokenize_roundtrip,
    example_7_lm_workflow,
    example_8_serving,
    example_9_quantized_prompted_lm,
    example_10_trained_weights,
]


def main():
    which = [int(a) for a in sys.argv[1:]] or range(1, len(EXAMPLES) + 1)
    try:
        for i in which:
            EXAMPLES[i - 1]()
    finally:
        shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
