"""Sample novel structure-token sequences from the GPT LM.

Counterpart of /root/reference/scripts/gpt_generation.py:56-295, with
KV-cached O(L) steps instead of full-forward O(L^2) per token.

Usage:
  python -m protein_structure_tokenizer_tpu.cli.gpt_generation \
      --sequence_save_path out --codebook_size 4096 \
      --params_path weights/gpt_4k_df_1/params.joblib --num_sequences 64
"""
import argparse
import logging
import os
import time

import numpy as np

from protein_structure_tokenizer_tpu.cli.common import (
    CODEBOOK_CHOICES,
    force_backend,
    setup_logging,
)
from protein_structure_tokenizer_tpu.lm import gpt, sampling

logger = logging.getLogger(__name__)


def load_gpt_params(path: str):
    """GPT weights: released joblib pickle of haiku params, or the native
    ``scope//name`` npz written by cli.train_lm --export_params."""
    if path.endswith(".npz"):
        from protein_structure_tokenizer_tpu.runtime import checkpoints

        return checkpoints.load_params(path)
    import joblib

    return joblib.load(path)


def main(argv=None) -> None:
    setup_logging()
    parser = argparse.ArgumentParser(description="Generate token sequences")
    parser.add_argument("--sequence_save_path", type=str, required=True)
    parser.add_argument("--codebook_size", type=int, default=4096, choices=CODEBOOK_CHOICES)
    parser.add_argument("--model_downsampling", type=int, default=1, choices=[1, 2])
    parser.add_argument("--batch_size_per_device", type=int, default=8)
    parser.add_argument("--params_path", type=str, default=None)
    parser.add_argument("--sampling_method", type=str, default="temperature",
                        choices=["temperature", "top_k", "top_p", "random"],
                        help="'random' is the model-free length-matched "
                        "baseline (reference generation_utils.py:193-257)")
    parser.add_argument("--average_num_struct_tokens", type=int, default=256,
                        help="Poisson length mean for --sampling_method random")
    parser.add_argument("--sampling_temp", type=float, default=0.6)
    parser.add_argument("--top_k", type=int, default=4)
    parser.add_argument("--top_p", type=float, default=0.15)
    parser.add_argument("--num_sequences", type=int, default=128)
    parser.add_argument("--seed", type=int, default=0)
    # Architecture overrides matching cli.train_lm (for custom-trained LMs;
    # defaults reproduce the released 20-layer/1024-dim GPT).
    parser.add_argument("--num_layers", type=int, default=None)
    parser.add_argument("--embed_dim", type=int, default=None)
    parser.add_argument("--num_heads", type=int, default=None)
    parser.add_argument("--block_size", type=int, default=None)
    parser.add_argument("--num_experts", type=int, default=0,
                        help="MoE architecture override (cli.train_lm MoE LMs)")
    parser.add_argument("--num_selected_experts", type=int, default=2)
    parser.add_argument("--moe_layer_stride", type=int, default=1)
    parser.add_argument("--prompt_tokens", type=str, default=None,
                        help=".npy file of structure-token ids (1-D) to "
                             "condition on: every sampled sequence "
                             "continues this prefix (prefix completion — "
                             "e.g. tokens from cli.tokenize_pdb of a "
                             "partial structure)")
    parser.add_argument("--stop_at_eos", action="store_true",
                        help="Exit the sampling loop once every row has "
                        "emitted EOS (typical proteins need ~180 of the 514 "
                        "steps; stripped outputs are identical)")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 params + KV cache with f32 softmax/LN/"
                             "logits islands and a fused qkv projection — "
                             "the fast sampling recipe (~2x tokens/s; "
                             "distribution equivalence pinned in "
                             "tests/test_gpt.py).  Incompatible with "
                             "--tensor_parallel")
    parser.add_argument("--int8", action="store_true",
                        help="weight-only int8 serving path: per-layer "
                             "matmul weights stored int8 with per-output-"
                             "channel f32 scales (halves the dominant "
                             "parameter read vs bf16), bf16 activations + "
                             "KV cache, f32 softmax/LN/logits islands.  "
                             "Implies --bf16; distribution shift pinned in "
                             "tests/test_gpt.py")
    parser.add_argument("--int8_kv", action="store_true",
                        help="int8 KV cache with per-(batch,position,head) "
                             "f32 scales folded into the attention matmuls "
                             "— halves the dominant cache read vs bf16.  "
                             "Combine with --int8 for the full int8 "
                             "serving recipe")
    parser.add_argument("--cache_segment", type=int, default=None,
                        help="grow the KV cache in this many-step segments "
                             "instead of allocating the full block.  "
                             "Measured optima on a v5e at the released "
                             "size: 64 for bf16 (any batch) and int8 at "
                             "large batch; 128 for int8 at batch <= 32 "
                             "(docs/PERFORMANCE.md)")
    parser.add_argument("--no_cache", action="store_true",
                        help="reference-equivalent full-forward sampling")
    parser.add_argument("--backend", type=str, default=None,
                        choices=["cpu", "gpu", "tpu", None])
    parser.add_argument("--tensor_parallel", type=int, default=1,
                        help="Model-axis size: shard each transformer block "
                        "Megatron-style over this many chips (must divide "
                        "device count, num_heads, and ffn dim).")
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
    if args.num_experts:
        overrides["num_experts"] = args.num_experts
        overrides["num_selected_experts"] = args.num_selected_experts
        overrides["moe_layer_stride"] = args.moe_layer_stride
    if overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **overrides)

    if args.params_path:
        params = load_gpt_params(args.params_path)
        logger.info("loaded GPT weights from %s", args.params_path)
    else:
        params = gpt.init(jax.random.PRNGKey(args.seed), cfg)
        logger.warning("no --params_path: using RANDOM weights (smoke mode)")

    mesh = None
    if args.tensor_parallel > 1:
        from protein_structure_tokenizer_tpu.parallel import tp

        mesh = tp.make_2d_mesh(args.tensor_parallel)
        params = tp.shard_gpt_params(params, mesh)
        logger.info(
            "tensor parallel over %d chips (mesh %s)", args.tensor_parallel,
            dict(mesh.shape),
        )

    if args.bf16 or args.int8:
        if args.tensor_parallel > 1:
            raise SystemExit(
                "--bf16/--int8 fuse qkv weights, which tensor parallelism "
                "shards separately; use one or the other"
            )
        import jax.numpy as jnp

        from protein_structure_tokenizer_tpu.runtime.precision import cast_floats

        params = gpt.fuse_qkv_params(
            cast_floats(params, jnp.bfloat16), cfg
        )
        if args.int8:
            from protein_structure_tokenizer_tpu.lm import quant

            params = quant.quantize_gpt_params_int8(params)
            logger.info(
                "int8 serving path: int8 matmul weights + bf16 "
                "activations/KV cache, fused qkv"
            )
        else:
            logger.info("bf16 sampling path: bf16 params + KV cache, fused qkv")

    seq_dir = os.path.join(args.sequence_save_path, "seqs")
    os.makedirs(seq_dir, exist_ok=True)

    kwargs = {"temperature": args.sampling_temp}
    if args.sampling_method == "top_k":
        kwargs["k"] = args.top_k
    elif args.sampling_method == "top_p":
        kwargs["top_p"] = args.top_p

    prompt_row = None
    if args.prompt_tokens:
        if args.sampling_method == "random":
            raise SystemExit("--prompt_tokens is meaningless with the "
                             "model-free random baseline")
        prompt_row = np.load(args.prompt_tokens).reshape(-1).astype(np.int32)
        max_p = cfg.max_position_embeddings - 2
        if prompt_row.size > max_p:
            logger.warning(
                "prompt of %d tokens truncated to %d (block size %d)",
                prompt_row.size, max_p, cfg.max_position_embeddings,
            )
            prompt_row = prompt_row[:max_p]
        logger.info("conditioning on a %d-token prompt", prompt_row.size)

    key = jax.random.PRNGKey(args.seed)
    key, _ = jax.random.split(key)
    # Under tensor parallelism the data axis spans device_count / tp chips.
    batch = args.batch_size_per_device * (jax.device_count() // args.tensor_parallel)
    num_iterations = max(1, args.num_sequences // batch)
    sampling_keys = jax.random.split(key, num=num_iterations)

    start = time.time()
    all_sequences = []
    for i in range(num_iterations):
        if args.sampling_method == "random":
            tokens = sampling.random_sampling(
                sampling_keys[i],
                max_len=cfg.max_position_embeddings - 2,
                num_sequences=batch,
                average_num_struct_tokens=args.average_num_struct_tokens,
                codebook_size=args.codebook_size,
                eos_token_id=cfg.eos_token_id,
                bos_token_id=cfg.bos_token_id,
            )
            all_sequences.append(np.asarray(tokens))
            continue
        tokens = sampling.generate(
            params,
            cfg,
            sampling_keys[i],
            batch_size=batch,
            num_tokens=cfg.max_position_embeddings,
            method=args.sampling_method,
            use_cache=not args.no_cache,
            cache_segment=args.cache_segment,
            int8_kv=args.int8_kv,
            prompt=(None if prompt_row is None
                    else np.tile(prompt_row[None], (batch, 1))),
            stop_at_eos=args.stop_at_eos,
            mesh=mesh,
            **kwargs,
        )
        all_sequences.append(np.asarray(tokens))
    sequences = np.concatenate(all_sequences, axis=0)

    for seq_id in range(sequences.shape[0]):
        seq = sampling.strip_special_tokens(
            sequences[seq_id], cfg.bos_token_id, cfg.eos_token_id
        )
        np.save(os.path.join(seq_dir, f"tokens_{seq_id}.npy"), seq)

    logger.info(
        "generated %d sequences in %.1fs", sequences.shape[0], time.time() - start
    )


if __name__ == "__main__":
    main()
