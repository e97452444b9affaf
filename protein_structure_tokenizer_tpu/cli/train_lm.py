"""Train the GPT LM on structure-token sequences.

Completes the paper's workflow the reference leaves out (its scripts/lm has
sampling only — SURVEY.md §2.5): tokenize a corpus with cli.tokenize_pdb,
train here on the ``*_tokens.npy`` files, then sample with
cli.gpt_generation and decode with cli.decode_tokens.

Usage:
  python -m protein_structure_tokenizer_tpu.cli.train_lm \
      --tokens_dir out/tokens --checkpoint_dir out/lm_ckpt \
      --codebook_size 4096 --num_steps 5000 \
      --export_params out/gpt/params.joblib

Resume is automatic from --checkpoint_dir (orbax, latest step).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import time

import jax
import numpy as np

from protein_structure_tokenizer_tpu.cli.common import (
    CODEBOOK_CHOICES,
    force_backend,
    setup_logging,
)
from protein_structure_tokenizer_tpu.lm import gpt
from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
from protein_structure_tokenizer_tpu.runtime.metrics_log import MetricsLogger
from protein_structure_tokenizer_tpu.runtime.preemption import GracefulPreemption
from protein_structure_tokenizer_tpu.runtime.train_checkpoint import TrainCheckpointManager
from protein_structure_tokenizer_tpu.runtime.train_lm import (
    LmTrainConfig,
    TokenSequenceDataset,
    init_ep_train_state,
    init_fsdp_train_state,
    init_pp_train_state,
    init_tp_train_state,
    init_train_state,
    make_pp_train_step,
    make_train_step,
)

logger = logging.getLogger(__name__)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train the token GPT")
    p.add_argument("--tokens_dir", type=str, required=True,
                   help="Directory of *_tokens.npy files (tokenize_pdb output)")
    p.add_argument("--checkpoint_dir", type=str, required=True)
    p.add_argument("--codebook_size", type=int, default=4096, choices=CODEBOOK_CHOICES)
    p.add_argument("--num_steps", type=int, default=10000)
    p.add_argument("--batch_size_per_device", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--label_smoothing", type=float, default=0.0)
    p.add_argument("--block_size", type=int, default=None,
                   help="Sequence block (default: model max, 514)")
    p.add_argument("--num_layers", type=int, default=None,
                   help="Override model depth (default: released 20 layers)")
    p.add_argument("--embed_dim", type=int, default=None)
    p.add_argument("--num_heads", type=int, default=None,
                   help="Override head count (required if --embed_dim makes "
                   "the default 16 heads' key size < rope_dimensions)")
    p.add_argument("--pipeline_parallel", type=int, default=1,
                   help="Pipeline stages (GPipe over a ('data','pipe') mesh); "
                   "must divide the layer count and the device count")
    p.add_argument("--num_microbatches", type=int, default=None,
                   help="GPipe microbatches per step (default: stage count)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="Megatron tensor parallelism over a ('data','model') "
                   "mesh (qkv/fc1 column-, out/fc2 row-sharded)")
    p.add_argument("--sequence_parallel", action="store_true",
                   help="With --tensor_parallel: T-shard the residual stream "
                   "between blocks (Megatron-SP)")
    p.add_argument("--fsdp", action="store_true",
                   help="Fully-sharded data parallelism (ZeRO-3): shard every "
                   "parameter and Adam moment over the data axis; per-chip "
                   "state memory drops to params/n_chips (parallel/fsdp.py)")
    p.add_argument("--num_experts", type=int, default=0,
                   help="Mixture-of-experts: swap the MLP of every "
                   "--moe_layer_stride-th block for a top-k-routed MoE "
                   "(framework extension; the released GPT is dense)")
    p.add_argument("--num_selected_experts", type=int, default=2,
                   help="Experts per token (top-k routing)")
    p.add_argument("--moe_layer_stride", type=int, default=1,
                   help="Place an MoE MLP every k-th block (last block always)")
    p.add_argument("--expert_parallel", type=int, default=1,
                   help="Shard the stacked expert weights over an "
                   "('data','expert') mesh axis (requires --num_experts)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--max_to_keep", type=int, default=3)
    p.add_argument("--grad_accum_steps", type=int, default=1,
                   help="Average gradients over k micro-batches per update "
                   "(k x effective batch in one chip's memory)")
    p.add_argument("--metrics_file", type=str, default=None,
                   help="Append per-log-step scalar metrics as JSONL "
                   "(process 0 only)")
    p.add_argument("--export_params", type=str, default=None,
                   help="Write final params (.joblib for cli.gpt_generation)")
    p.add_argument("--backend", type=str, default=None,
                   choices=["cpu", "gpu", "tpu", None])
    return p.parse_args(argv)


def main(argv=None) -> None:
    setup_logging()
    args = parse_args(argv)
    force_backend(args.backend)
    mesh_lib.initialize_distributed()

    cfg = gpt.released_gpt_config(args.codebook_size)
    overrides = {}
    if args.num_layers is not None:
        overrides["num_layers"] = args.num_layers
    if args.embed_dim is not None:
        overrides["embed_dim"] = args.embed_dim
        overrides["ffn_embed_dim"] = 4 * args.embed_dim
        if args.num_heads is None:
            # Keep per-head key size >= rope dims with the released 64-dim heads.
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

    train_cfg = LmTrainConfig(
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps,
        total_steps=args.num_steps,
        label_smoothing=args.label_smoothing,
        grad_accum_steps=args.grad_accum_steps,
    )
    use_pp = args.pipeline_parallel > 1
    use_tp = args.tensor_parallel > 1
    use_ep = args.expert_parallel > 1
    if sum([use_pp, use_tp, use_ep, args.fsdp]) > 1:
        raise SystemExit(
            "--pipeline_parallel, --tensor_parallel, --expert_parallel and "
            "--fsdp are mutually exclusive"
        )
    if args.sequence_parallel and not use_tp:
        raise SystemExit("--sequence_parallel requires --tensor_parallel > 1")
    if args.num_microbatches is not None and not use_pp:
        raise SystemExit("--num_microbatches requires --pipeline_parallel > 1")
    if use_ep and not args.num_experts:
        raise SystemExit("--expert_parallel requires --num_experts > 0")
    if (use_pp or use_tp) and args.num_experts:
        raise SystemExit("MoE (--num_experts) is not supported with "
                         "--pipeline_parallel/--tensor_parallel; use "
                         "--expert_parallel")
    if use_pp:
        from protein_structure_tokenizer_tpu.parallel import pp

        mesh = pp.make_pp_mesh(args.pipeline_parallel)
        num_micro = args.num_microbatches or args.pipeline_parallel
    elif use_tp:
        from protein_structure_tokenizer_tpu.parallel import tp

        mesh = tp.make_2d_mesh(args.tensor_parallel)
    elif use_ep:
        from protein_structure_tokenizer_tpu.parallel import ep

        mesh = ep.make_ep_mesh(args.expert_parallel)
    else:
        mesh = mesh_lib.make_mesh()

    key = jax.random.PRNGKey(args.seed)
    fsdp_shardings = None
    if use_pp:
        params, opt_state = init_pp_train_state(key, cfg, train_cfg, mesh)
    elif use_tp:
        params, opt_state = init_tp_train_state(key, cfg, train_cfg, mesh)
    elif use_ep:
        params, opt_state = init_ep_train_state(key, cfg, train_cfg, mesh)
    elif args.fsdp:
        params, opt_state, fsdp_shardings = init_fsdp_train_state(
            key, cfg, train_cfg, mesh
        )
    else:
        params, opt_state = init_train_state(key, cfg, train_cfg, mesh)

    ckpt = TrainCheckpointManager(
        args.checkpoint_dir, max_to_keep=args.max_to_keep, save_every=args.save_every
    )
    start_step = 0
    restored = ckpt.restore(params, opt_state, key)
    if restored is not None:
        start_step, params, opt_state, key = restored
        start_step += 1

    if use_pp:
        train_step, _ = make_pp_train_step(cfg, train_cfg, mesh, num_micro)
    else:
        train_step, _ = make_train_step(
            cfg, train_cfg, mesh, sequence_parallel=args.sequence_parallel,
            fsdp_state_shardings=fsdp_shardings,
        )

    dataset = TokenSequenceDataset.from_dir(
        args.tokens_dir, cfg, seed=args.seed, block_size=args.block_size
    )
    global_batch = mesh_lib.global_batch_size(mesh, args.batch_size_per_device)
    if use_pp:
        # batch_size_per_device counts rows per data shard per microbatch:
        # the GPipe step consumes num_micro microbatches of (data-sharded) rows.
        global_batch *= num_micro
    local = mesh_lib.process_local_slice(mesh, global_batch)
    stream = dataset.batches(global_batch, start_step=start_step, local=local)
    logger.info(
        "dataset: %d sequences, global batch %d, vocab %d, starting at step %d",
        len(dataset), global_batch, cfg.vocab_size, start_step,
    )

    mlog = MetricsLogger(args.metrics_file)
    t0 = time.perf_counter()
    last_step = None  # step that actually ran (None: resumed-complete rerun)
    with GracefulPreemption() as pre:
        for step in range(start_step, args.num_steps):
            last_step = step
            tokens = mesh_lib.shard_batch_from_local(mesh, next(stream), global_batch)
            params, opt_state, metrics = train_step(params, opt_state, tokens)
            if step % args.log_every == 0 or step == args.num_steps - 1:
                metrics = jax.device_get(metrics)
                dt, t0 = time.perf_counter() - t0, time.perf_counter()
                logger.info(
                    "step %d | loss %.4f | ppl %.1f | acc %.3f | %.2fs",
                    step, float(metrics["loss"]), float(metrics["perplexity"]),
                    float(metrics.get("accuracy", np.nan)), dt,
                )
                mlog.log(step, metrics)
                if not np.isfinite(float(metrics["loss"])):
                    raise FloatingPointError(f"non-finite loss at step {step}")
            ckpt.save(step, params, opt_state, key)
            if pre.should_stop:
                logger.warning("preempted: checkpointing step %d and exiting", step)
                break

    mlog.close()
    if last_step is not None:
        # Final checkpoint of the last step that ran; idempotent if the
        # periodic gate already wrote it.  A rerun of a completed job runs
        # no steps and must not invent checkpoints past the horizon.
        ckpt.save(last_step, params, opt_state, key, force=True)
    ckpt.wait()
    if pre.should_stop:
        ckpt.close()
        logger.info("preemption checkpoint complete at step %d; resume with "
                     "the same --checkpoint_dir", last_step)
        return
    if args.export_params and jax.process_index() == 0:
        if use_pp:
            from protein_structure_tokenizer_tpu.parallel import pp

            params = pp.merge_stage_params(
                jax.device_get(params["stages"]), jax.device_get(params["rest"]), cfg
            )
        elif use_tp:
            from protein_structure_tokenizer_tpu.parallel import tp

            params = tp.unshard_gpt_params(jax.device_get(params))
        elif args.fsdp:
            # all-gather the shards before the host transfer
            params = jax.jit(
                lambda p: p, out_shardings=mesh_lib.replicated_sharding(mesh)
            )(params)
        host_params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
        if args.export_params.endswith(".joblib"):
            import joblib

            joblib.dump(host_params, args.export_params)
        else:
            from protein_structure_tokenizer_tpu.runtime import checkpoints

            checkpoints.save_params(host_params, args.export_params)
            # The exact GptConfig alongside the weights so downstream tools
            # (tools/trained_quality.py, tests) can rebuild the model without
            # re-deriving CLI overrides.
            import dataclasses as _dc

            base = args.export_params
            if base.endswith(".npz"):
                base = base[:-4]
            with open(base + ".config.json", "w") as f:
                json.dump(_dc.asdict(cfg), f, indent=2, sort_keys=True)
        logger.info("exported params to %s", args.export_params)
    ckpt.close()
    logger.info("LM training complete at step %d", args.num_steps - 1)


if __name__ == "__main__":
    main()
