"""Trained-weights quality report: the framework's first non-random numbers.

Round-5 directive: every quality claim previously rested on random weights
(bf16-vs-f32 drift ~1 Å CA-RMSD is the random-weight WORST case,
tests/test_precision.py).  This driver measures the real thing end-to-end
with weights trained by cli/train.py on the TPU:

  1. tokenize the training corpus with the trained tokenizer (f32 path),
  2. decode the tokens back to structures in f32 AND bf16,
  3. score reconstruction vs the ground-truth PDBs (CA TM-score/RMSD/GDT,
     eval/metrics.py) for both precisions,
  4. score bf16 decode DIRECTLY against f32 decode at the same weights —
     the measured precision delta with converged weights,
  5. optionally (--gpt_weights): sample the trained GPT, decode the samples,
     and report LM scores of corpus rows vs sampled rows.

Reference loop being validated: /root/reference/scripts/gpt_generation.py
90-254 + README.md:130-143 (tokenize -> LM -> decode -> evaluate).

Usage:
  python tools/trained_quality.py \
      --weights artifacts/trained/tokenizer_4096_df1 --seq_max 192 \
      --corpus artifacts/train_corpus --out artifacts/trained/quality \
      [--gpt_weights artifacts/trained/gpt_tiny --gpt_config artifacts/trained/gpt_tiny/config.json] \
      [--backend cpu]

Writes <out>/report.json and prints the headline numbers.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def run_cli(module: str, argv: list[str]) -> None:
    import importlib

    mod = importlib.import_module(f"protein_structure_tokenizer_tpu.cli.{module}")
    mod.main(argv)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--weights", required=True, help="trained tokenizer npz dir")
    p.add_argument("--corpus", required=True, help="dir of ground-truth .pdb files")
    p.add_argument("--out", required=True)
    p.add_argument("--seq_max", type=int, default=192)
    p.add_argument("--codebook_size", type=int, default=4096)
    p.add_argument("--model_downsampling", type=int, default=1)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--gpt_weights", default=None,
                   help="trained GPT npz file (cli/train_lm --export_params)")
    p.add_argument("--gpt_config", default=None,
                   help="GptConfig JSON (default: <gpt_weights>.config.json, "
                   "which train_lm writes next to the export)")
    p.add_argument("--num_samples", type=int, default=8)
    p.add_argument("--backend", default=None, choices=["cpu", "tpu", None])
    args = p.parse_args(argv)

    from protein_structure_tokenizer_tpu.cli.common import force_backend

    force_backend(args.backend)

    os.makedirs(args.out, exist_ok=True)
    tokens_dir = os.path.join(args.out, "tokens")
    f32_dir = os.path.join(args.out, "decode_f32")
    bf16_dir = os.path.join(args.out, "decode_bf16")
    for d in (tokens_dir, f32_dir, bf16_dir):
        shutil.rmtree(d, ignore_errors=True)

    model_flags = [
        "--codebook_size", str(args.codebook_size),
        "--model_downsampling", str(args.model_downsampling),
        "--seq_max", str(args.seq_max),
        "--weights", args.weights,
        "--batch_size_per_device", str(args.batch),
    ]

    run_cli("tokenize_pdb", [
        "--pdb_dir", args.corpus, "--token_save_path", tokens_dir, *model_flags,
    ])
    run_cli("decode_tokens", [
        "--tokens_dir", tokens_dir, "--structure_save_path", f32_dir,
        *model_flags,
    ])
    run_cli("decode_tokens", [
        "--tokens_dir", tokens_dir, "--structure_save_path", bf16_dir,
        *model_flags, "--bf16",
    ])

    from protein_structure_tokenizer_tpu.eval.metrics import compare_structure_dirs

    f32_structs = os.path.join(f32_dir, "structures")
    bf16_structs = os.path.join(bf16_dir, "structures")
    report = {
        "recon_f32_vs_target": compare_structure_dirs(f32_structs, args.corpus),
        "recon_bf16_vs_target": compare_structure_dirs(bf16_structs, args.corpus),
        # The measured bf16 precision delta AT these weights: bf16 decode
        # compared directly against the f32 decode of the same tokens.
        "bf16_vs_f32": compare_structure_dirs(bf16_structs, f32_structs),
    }

    if args.gpt_weights:
        report["lm"] = _lm_stage(args, tokens_dir, model_flags)

    out_path = os.path.join(args.out, "report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)

    agg_f32 = report["recon_f32_vs_target"]["__aggregate__"]
    agg_b16 = report["recon_bf16_vs_target"]["__aggregate__"]
    delta = report["bf16_vs_f32"]["__aggregate__"]
    print(json.dumps({
        "recon_f32_tm_mean": round(agg_f32["tm_mean"], 4),
        "recon_f32_rmsd_mean": round(agg_f32["rmsd_mean"], 3),
        "recon_bf16_tm_mean": round(agg_b16["tm_mean"], 4),
        "recon_bf16_rmsd_mean": round(agg_b16["rmsd_mean"], 3),
        "bf16_vs_f32_rmsd_mean": round(delta["rmsd_mean"], 4),
        "bf16_vs_f32_tm_mean": round(delta["tm_mean"], 4),
        "report": out_path,
    }))


def _lm_stage(args, tokens_dir: str, model_flags: list[str]) -> dict:
    """Sample the trained GPT, decode the samples, score corpus likelihoods."""
    import glob

    import numpy as np

    from protein_structure_tokenizer_tpu.lm import gpt, scoring
    from protein_structure_tokenizer_tpu.runtime import checkpoints

    cfg_path = args.gpt_config
    if cfg_path is None:
        base = args.gpt_weights
        if base.endswith(".npz"):
            base = base[:-4]
        cfg_path = base + ".config.json"
    with open(cfg_path) as f:
        gcfg = gpt.GptConfig(**json.load(f))
    import jax

    template = gpt.init(jax.random.PRNGKey(0), gcfg)
    params = checkpoints.load_params(
        args.gpt_weights, jax.tree_util.tree_map(np.asarray, template)
    )

    # Corpus log-likelihood under the trained LM.
    rows = [
        np.load(fp).reshape(-1).astype(np.int32)
        for fp in sorted(glob.glob(os.path.join(tokens_dir, "*_tokens.npy")))
    ]
    framed = scoring.frame_rows(rows, gcfg)
    scored = scoring.score_sequences(params, gcfg, framed)
    corpus_ppl = [float(x) for x in np.asarray(scored["perplexity"])]

    # Sample, decode, and TM-score the sampled structures against their own
    # f32 decode (self-consistency) is meaningless; instead record sampled
    # row lengths + decode success, and likelihoods of samples vs corpus.
    from protein_structure_tokenizer_tpu.lm import sampling

    toks = sampling.generate(
        params, gcfg, jax.random.PRNGKey(123),
        batch_size=args.num_samples,
        num_tokens=gcfg.max_position_embeddings,
        method="temperature", temperature=0.8, k=20, top_p=0.95,
        stop_at_eos=True,
    )
    arr = np.asarray(toks)
    samples = [
        sampling.strip_special_tokens(r, gcfg.bos_token_id, gcfg.eos_token_id)
        for r in arr
    ]
    sample_lens = [int(s.size) for s in samples]
    kept = [s for s in samples if s.size >= 8]
    sample_ppl = []
    if kept:
        sframed = scoring.frame_rows(kept, gcfg)
        sscored = scoring.score_sequences(params, gcfg, sframed)
        sample_ppl = [float(x) for x in np.asarray(sscored["perplexity"])]

    # Decode the sampled token rows to structures via the tokenizer.
    sample_dir = os.path.join(args.out, "sample_tokens")
    decode_dir = os.path.join(args.out, "sample_structures")
    shutil.rmtree(sample_dir, ignore_errors=True)
    shutil.rmtree(decode_dir, ignore_errors=True)
    os.makedirs(sample_dir)
    n_decoded = 0
    for i, s in enumerate(kept):
        if s.size > args.seq_max * 1:  # decoder rows cap at seq_max tokens
            s = s[: args.seq_max]
        np.save(os.path.join(sample_dir, f"sample{i:02d}_tokens.npy"),
                s.reshape(1, -1).astype(np.uint32))
        n_decoded += 1
    if n_decoded:
        run_cli("decode_tokens", [
            "--tokens_dir", sample_dir, "--structure_save_path", decode_dir,
            *model_flags,
        ])

    return {
        "corpus_perplexity": corpus_ppl,
        "corpus_perplexity_mean": float(np.mean(corpus_ppl)),
        "sample_lengths": sample_lens,
        "sample_perplexity": sample_ppl,
        "num_sampled_structures_decoded": n_decoded,
        "sample_structures_dir": decode_dir if n_decoded else None,
    }


if __name__ == "__main__":
    main()
