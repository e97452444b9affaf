"""Serve the tokenizer (and optionally the token GPT) over HTTP.

Always-on inference with continuous micro-batching (runtime/server.py) — the
capability the reference's run-once scripts lack.  One static-shape jitted
executable per op; concurrent requests ride shared device dispatches.

Usage:
  python -m protein_structure_tokenizer_tpu.cli.serve \
      --codebook_size 4096 --model_downsampling 1 --weights weights/4k_df_1 \
      --port 8000 --max_batch 16 --max_wait_ms 10 \
      [--gpt_weights gpt/params.joblib]

  curl -X POST --data-binary @T1024.pdb localhost:8000/tokenize
  curl -X POST -d '{"tokens": [1, 2, 3]}' localhost:8000/decode
  curl -X POST -d '{"num_sequences": 2}' localhost:8000/generate
  curl localhost:8000/stats
"""
from __future__ import annotations

import argparse
import logging

import jax

from protein_structure_tokenizer_tpu.cli.common import (
    add_model_args,
    build_runner,
    setup_logging,
)
from protein_structure_tokenizer_tpu.runtime.server import (
    BatchingEngine,
    InferenceServer,
)

logger = logging.getLogger(__name__)


def main(argv=None) -> None:
    setup_logging()
    parser = argparse.ArgumentParser(description="Serve tokenize/decode/generate")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max_batch", type=int, default=16,
                        help="Static device batch (requests per dispatch cap)")
    parser.add_argument("--max_wait_ms", type=float, default=10.0,
                        help="Batching window opened by the first request")
    parser.add_argument("--gpt_weights", type=str, default=None,
                        help="GPT params.joblib to enable POST /generate")
    parser.add_argument("--gpt_int8", action="store_true",
                        help="serve /generate on the int8 recipe: int8 "
                             "matmul weights + int8 KV cache, bf16 "
                             "activations (lm/quant.py; ~1.4-1.5x the "
                             "bf16 path)")
    # GPT architecture overrides matching cli.train_lm / cli.gpt_generation —
    # a custom-trained LM's config must match its checkpoint.
    parser.add_argument("--num_layers", type=int, default=None)
    parser.add_argument("--embed_dim", type=int, default=None)
    parser.add_argument("--num_heads", type=int, default=None)
    parser.add_argument("--block_size", type=int, default=None)
    parser.add_argument("--num_experts", type=int, default=0)
    parser.add_argument("--num_selected_experts", type=int, default=2)
    parser.add_argument("--moe_layer_stride", type=int, default=1)
    add_model_args(parser)
    args = parser.parse_args(argv)

    runner = build_runner(args)
    engine = BatchingEngine(
        runner, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms
    )

    gpt_params = gpt_config = None
    if args.gpt_weights:
        import joblib

        from protein_structure_tokenizer_tpu.lm import gpt

        gpt_config = gpt.released_gpt_config(args.codebook_size)
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
        if args.num_experts:
            overrides["num_experts"] = args.num_experts
            overrides["num_selected_experts"] = args.num_selected_experts
            overrides["moe_layer_stride"] = args.moe_layer_stride
        if overrides:
            import dataclasses

            gpt_config = dataclasses.replace(gpt_config, **overrides)
        gpt_params = joblib.load(args.gpt_weights)
        # Fail at startup, not per-request, when config and weights disagree.
        from protein_structure_tokenizer_tpu.utils.params import assert_compatible

        assert_compatible(gpt.init(jax.random.PRNGKey(0), gpt_config), gpt_params)
        logger.info("loaded GPT weights from %s", args.gpt_weights)
        if args.gpt_int8:
            import jax.numpy as jnp

            from protein_structure_tokenizer_tpu.lm import quant
            from protein_structure_tokenizer_tpu.runtime.precision import cast_floats

            gpt_params = quant.quantize_gpt_params_int8(
                gpt.fuse_qkv_params(cast_floats(gpt_params, jnp.bfloat16), gpt_config)
            )
            logger.info("int8 GPT serving: int8 weights + KV cache")

    server = InferenceServer(
        engine,
        host=args.host,
        port=args.port,
        gpt_params=gpt_params,
        gpt_config=gpt_config,
        sampling_defaults={"int8_kv": True} if args.gpt_int8 else None,
    )
    logger.info(
        "serving %s/df%d on %s:%d (max_batch=%d, window=%.1fms)",
        args.codebook_size, args.model_downsampling, args.host, server.port,
        engine.max_batch, args.max_wait_ms,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down")
    finally:
        server.close()


if __name__ == "__main__":
    main()
