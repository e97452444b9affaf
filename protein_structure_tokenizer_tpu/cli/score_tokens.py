"""Score token sequences under a trained GPT: log-likelihood / perplexity.

Framework extension (no reference counterpart — the reference computes
perplexity only as a training metric): rank generated structures by model
likelihood or evaluate a token corpus.

Usage:
  python -m protein_structure_tokenizer_tpu.cli.score_tokens \
      --tokens_dir out/seqs --codebook_size 4096 \
      --params_path weights/gpt_4k_df_1/params.joblib --output scores.json
"""
import argparse
import glob
import json
import logging
import os

import numpy as np

from protein_structure_tokenizer_tpu.cli.common import (
    CODEBOOK_CHOICES,
    force_backend,
    setup_logging,
)
from protein_structure_tokenizer_tpu.cli.gpt_generation import load_gpt_params
from protein_structure_tokenizer_tpu.lm import gpt, scoring

logger = logging.getLogger(__name__)


def main(argv=None) -> None:
    setup_logging()
    parser = argparse.ArgumentParser(description="LM-score token sequences")
    parser.add_argument("--tokens_dir", type=str, required=True,
                        help="directory of *.npy token files (cli.tokenize_pdb "
                             "or cli.gpt_generation output)")
    parser.add_argument("--output", type=str, default=None,
                        help="write a JSON report here (default: stdout)")
    parser.add_argument("--codebook_size", type=int, default=4096,
                        choices=CODEBOOK_CHOICES)
    parser.add_argument("--params_path", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--seed", type=int, default=0)
    # Architecture overrides matching cli.train_lm / cli.gpt_generation.
    parser.add_argument("--num_layers", type=int, default=None)
    parser.add_argument("--embed_dim", type=int, default=None)
    parser.add_argument("--num_heads", type=int, default=None)
    parser.add_argument("--block_size", type=int, default=None)
    parser.add_argument("--backend", type=str, default=None,
                        choices=["cpu", "gpu", "tpu", None])
    args = parser.parse_args(argv)

    import jax

    force_backend(args.backend)

    cfg = gpt.released_gpt_config(args.codebook_size)
    overrides = {}
    if args.num_layers is not None:
        overrides["num_layers"] = args.num_layers
    if args.embed_dim is not None:
        overrides["embed_dim"] = args.embed_dim
        overrides["ffn_embed_dim"] = 4 * args.embed_dim
        if args.num_heads is None:
            overrides["num_heads"] = max(1, args.embed_dim // 64)
    if args.num_heads is not None:
        overrides["num_heads"] = args.num_heads
    if args.block_size is not None:
        overrides["max_position_embeddings"] = args.block_size
    if overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **overrides)

    if args.params_path:
        params = load_gpt_params(args.params_path)
        logger.info("loaded GPT weights from %s", args.params_path)
    else:
        params = gpt.init(jax.random.PRNGKey(args.seed), cfg)
        logger.warning("no --params_path: using RANDOM weights (smoke mode)")

    files = sorted(glob.glob(os.path.join(args.tokens_dir, "*.npy")))
    if not files:
        raise SystemExit(f"no *.npy token files under {args.tokens_dir}")
    rows = [np.load(f).reshape(-1) for f in files]

    score_fn = jax.jit(
        lambda p, t: scoring.score_sequences(p, cfg, t)
    )
    report = {}
    # One framed length per batch (sorted by length -> minimal padding,
    # one compile per distinct frame length).
    order = sorted(range(len(rows)), key=lambda i: len(rows[i]))
    for lo in range(0, len(order), args.batch_size):
        idx = order[lo : lo + args.batch_size]
        framed = scoring.frame_rows([rows[i] for i in idx], cfg)
        out = score_fn(params, framed)
        for j, i in enumerate(idx):
            report[os.path.basename(files[i])] = {
                "log_likelihood": float(out["log_likelihood"][j]),
                "perplexity": float(out["perplexity"][j]),
                "num_scored": int(out["num_scored"][j]),
            }

    text = json.dumps(report, indent=2, sort_keys=True)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
        logger.info("scored %d sequences -> %s", len(report), args.output)
    else:
        print(text)


if __name__ == "__main__":
    main()
