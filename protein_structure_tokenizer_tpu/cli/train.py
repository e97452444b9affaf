"""Train the tokenizer autoencoder (the loop the reference never shipped).

The reference releases FAPE losses but no optimizer driver
(/root/reference/structure_tokenizer/model/folding.py:528-649; SURVEY.md §3.4).
This CLI completes the stack: sharded optax train step over the data mesh,
shuffled PDB/npz corpus streaming, orbax checkpointing with resume, and an
optional warm start from the released InstaDeep weights.

Usage:
  python -m protein_structure_tokenizer_tpu.cli.train \
      --data_dir casp14_pdbs --checkpoint_dir out/ckpt \
      --codebook_size 4096 --model_downsampling 1 \
      --num_steps 10000 --batch_size_per_device 4

Resume is automatic: re-running with the same --checkpoint_dir restarts from
the latest saved step (data stream included — the shuffle is reconstructed
from (seed, step)).
"""
from __future__ import annotations

import argparse
import logging
import time

import jax
import numpy as np

from protein_structure_tokenizer_tpu.cli.common import (
    CODEBOOK_CHOICES,
    force_backend,
    setup_logging,
)
from protein_structure_tokenizer_tpu.data.featurize import FeaturizeConfig
from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import preset
from protein_structure_tokenizer_tpu.models.losses import FapeConfig, LossConfig
from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
from protein_structure_tokenizer_tpu.runtime import checkpoints
from protein_structure_tokenizer_tpu.runtime.metrics_log import MetricsLogger
from protein_structure_tokenizer_tpu.runtime.preemption import GracefulPreemption
from protein_structure_tokenizer_tpu.runtime.dataset import DatasetConfig, StructureDataset
from protein_structure_tokenizer_tpu.runtime.train import (
    TrainConfig,
    init_fsdp_train_state,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from protein_structure_tokenizer_tpu.runtime.train_checkpoint import TrainCheckpointManager

logger = logging.getLogger(__name__)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train the structure tokenizer")
    p.add_argument("--data_dir", type=str, required=True,
                   help="Directory of .pdb files and/or DataPipeline .npz files")
    p.add_argument("--checkpoint_dir", type=str, required=True)
    p.add_argument("--codebook_size", type=int, default=4096, choices=CODEBOOK_CHOICES)
    p.add_argument("--model_downsampling", type=int, default=1, choices=[1, 2, 4])
    p.add_argument("--init_weights", type=str, default=None,
                   help="Released params.npz dir to warm-start from")
    p.add_argument("--num_steps", type=int, default=10000)
    p.add_argument("--batch_size_per_device", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--grad_clip_norm", type=float, default=1.0)
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="> 0: warmup + cosine decay to 10%% of peak over "
                   "--num_steps (default: constant rate)")
    p.add_argument("--pct_unclamped", type=float, default=0.1,
                   help="Fraction of layers trained with unclamped FAPE")
    p.add_argument("--seq_max", type=int, default=512,
                   help="Residue padding/ceiling (train longer-chain models than the reference's 512 cap)")
    p.add_argument("--fsdp", action="store_true",
                   help="Fully-sharded data parallelism (ZeRO-3): shard "
                   "params and Adam moments over the data axis "
                   "(parallel/fsdp.py); exclusive with --context_parallel")
    p.add_argument("--context_parallel", type=int, default=1,
                   help="Row-shard the quadratic tensors (edge table, pair "
                   "track, IPA logits) over a ('data','ctx') mesh in forward "
                   "AND backward — 1/ctx pair memory for long-chain training")
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
    p.add_argument("--num_workers", type=int, default=0,
                   help="Featurization worker processes (0 = inline)")
    p.add_argument("--no_cache", action="store_true",
                   help="Re-featurize every epoch instead of caching in memory")
    p.add_argument("--export_params", type=str, default=None,
                   help="Write final params as a native npz after training")
    p.add_argument("--backend", type=str, default=None,
                   choices=["cpu", "gpu", "tpu", None])
    return p.parse_args(argv)


def main(argv=None) -> None:
    setup_logging()
    args = parse_args(argv)
    force_backend(args.backend)
    mesh_lib.initialize_distributed()

    cfg = preset(args.codebook_size, args.model_downsampling, seq_max=args.seq_max)
    train_cfg = TrainConfig(
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        grad_clip_norm=args.grad_clip_norm,
        warmup_steps=args.warmup_steps,
        total_steps=args.num_steps,
        grad_accum_steps=args.grad_accum_steps,
        loss=LossConfig(fape=FapeConfig(pct_unclamped=args.pct_unclamped)),
    )
    if args.context_parallel > 1 and args.fsdp:
        raise SystemExit("--fsdp is exclusive with --context_parallel")
    if args.context_parallel > 1:
        from protein_structure_tokenizer_tpu.parallel import cp

        mesh = cp.make_ctx_mesh(args.context_parallel)
    else:
        mesh = mesh_lib.make_mesh()
    logger.info(
        "mesh: %d devices x %d processes", mesh.devices.size, jax.process_count()
    )

    key = jax.random.PRNGKey(args.seed)
    fsdp_shardings = None
    if args.fsdp:
        warm = None
        if args.init_weights:
            template = jax.tree_util.tree_map(
                np.asarray, vq3d.init(key, cfg)
            )
            warm = checkpoints.load_released_params(args.init_weights, template)
            logger.info("warm-started from %s", args.init_weights)
        params, opt_state, fsdp_shardings = init_fsdp_train_state(
            key, cfg, train_cfg, mesh, params=warm
        )
    else:
        params, opt_state = init_train_state(key, cfg, train_cfg, mesh)
        if args.init_weights:
            template = jax.tree_util.tree_map(np.asarray, params)
            params = mesh_lib.replicate(
                mesh, checkpoints.load_released_params(args.init_weights, template)
            )
            opt_state = mesh_lib.replicate(mesh, make_optimizer(train_cfg).init(params))
            logger.info("warm-started from %s", args.init_weights)

    ckpt = TrainCheckpointManager(
        args.checkpoint_dir, max_to_keep=args.max_to_keep, save_every=args.save_every
    )
    start_step = 0
    restored = ckpt.restore(params, opt_state, key)
    if restored is not None:
        start_step, params, opt_state, key = restored
        start_step += 1

    train_step, _ = make_train_step(cfg, train_cfg, mesh, fsdp_state_shardings=fsdp_shardings)

    data_cfg = DatasetConfig(
        featurize=FeaturizeConfig(
            num_neighbor=cfg.data.graph_max_neighbor,
            downsampling_ratio=cfg.data.downsampling_ratio,
            padding_num_residue=cfg.data.seq_max_size,
            crop_index=cfg.data.seq_max_size,
        ),
        seed=args.seed,
        num_workers=args.num_workers,
    )
    dataset = StructureDataset.from_dir(args.data_dir, data_cfg, cache=not args.no_cache)
    global_batch = mesh_lib.global_batch_size(mesh, args.batch_size_per_device)
    local = mesh_lib.process_local_slice(mesh, global_batch)
    stream = dataset.batches(global_batch, start_step=start_step, local=local)
    logger.info(
        "dataset: %d structures, global batch %d, starting at step %d",
        len(dataset), global_batch, start_step,
    )

    mlog = MetricsLogger(args.metrics_file)
    t0 = time.perf_counter()
    last_step = None  # step that actually ran (None: resumed-complete rerun)
    with GracefulPreemption() as pre:
        for step in range(start_step, args.num_steps):
            last_step = step
            batch = mesh_lib.shard_batch_from_local(mesh, next(stream), global_batch)
            key, step_key = jax.random.split(key)
            params, opt_state, metrics = train_step(params, opt_state, batch, step_key)
            if step % args.log_every == 0 or step == args.num_steps - 1:
                metrics = jax.device_get(metrics)
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                logger.info(
                    "step %d | loss %.4f | bb_fape %.4f | sc_fape %.4f | ppl %.1f | %.2fs",
                    step,
                    float(metrics["loss"]),
                    float(metrics["backbone_fape"]),
                    float(metrics["sidechain_fape"]),
                    float(metrics.get("codebook_perplexity", np.nan)),
                    dt,
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
        if args.fsdp:
            # all-gather the shards before the host transfer
            params = jax.jit(
                lambda p: p, out_shardings=mesh_lib.replicated_sharding(mesh)
            )(params)
        host_params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
        checkpoints.save_params(host_params, args.export_params)
        logger.info("exported params to %s", args.export_params)
    ckpt.close()
    logger.info("training complete at step %d", args.num_steps - 1)


if __name__ == "__main__":
    main()
