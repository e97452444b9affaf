"""Shared CLI plumbing."""
from __future__ import annotations

import argparse
import logging
import os

import jax

from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import preset
from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
from protein_structure_tokenizer_tpu.runtime import checkpoints
from protein_structure_tokenizer_tpu.runtime.runner import InferenceRunner

logger = logging.getLogger(__name__)

CODEBOOK_CHOICES = [432, 1728, 4096, 64000]


def add_model_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--codebook_size", type=int, default=4096, choices=CODEBOOK_CHOICES)
    parser.add_argument("--model_downsampling", type=int, default=1, choices=[1, 2, 4])
    parser.add_argument(
        "--weights",
        type=str,
        default=None,
        help="Directory with released params.npz (+ state_variables.npy). "
        "Omitted: randomly initialized weights (smoke runs only).",
    )
    parser.add_argument("--batch_size_per_device", type=int, default=16)
    parser.add_argument(
        "--backend",
        type=str,
        default=None,
        choices=["cpu", "gpu", "tpu", None],
        help="Device platform; defaults to the JAX default backend.",
    )
    parser.add_argument(
        "--profile_dir",
        type=str,
        default=None,
        help="Capture an XLA profiler trace of the run into this directory "
        "(view with XProf/TensorBoard).",
    )
    parser.add_argument(
        "--exact",
        action="store_true",
        help="Bit-exact (reference-order) message aggregation instead of the "
        "TPU-fast path.",
    )
    parser.add_argument(
        "--bf16",
        action="store_true",
        help="bf16 compute (2x MXU, half HBM traffic) with f32 islands for "
        "FSQ rounding, IPA point geometry, and rigid composition.  Token ids "
        "may differ from the f32 conformance path near rounding boundaries.",
    )
    parser.add_argument(
        "--seq_max",
        type=int,
        default=512,
        help="Residue padding/ceiling (the reference hard-caps at 512). "
        "Non-default values need retrained weights — the positional-encoding "
        "base scales with it.",
    )
    parser.add_argument(
        "--context_parallel",
        type=int,
        default=1,
        help="Shard the decoder's quadratic pair track over this many chips "
        "(('data','ctx') mesh, parallel/cp.py): per-chip pair memory and "
        "pair FLOPs scale 1/ctx.  Must divide the device count.",
    )


def force_backend(backend: str | None) -> None:
    """Pin jax to ``backend`` before any device is touched.

    The env-var route (``JAX_PLATFORMS=cpu``) is unreliable: site hooks may
    re-register an accelerator plugin and override the variable at interpreter
    start.  ``jax.config`` wins as long as no backend has been initialized
    yet, so the CLIs call this first thing.
    """
    if backend in ("cpu", "tpu"):
        jax.config.update("jax_platforms", backend)


def build_runner(args) -> InferenceRunner:
    force_backend(args.backend)
    mesh_lib.initialize_distributed()
    cfg = preset(
        args.codebook_size, args.model_downsampling,
        seq_max=getattr(args, "seq_max", 512),
    )
    template = vq3d.init(jax.random.PRNGKey(0), cfg)
    if args.weights:
        # Auto-detect: released HF dir OR a native npz exported by
        # cli/train.py (checkpoints.load_weights) — trained weights
        # round-trip through the same flag as released ones.
        params = checkpoints.load_weights(args.weights, template)
        logger.info("loaded weights from %s", args.weights)
    else:
        params = template
        logger.warning("no --weights given: using RANDOM weights (smoke mode)")
    devices = jax.devices(args.backend) if args.backend else jax.devices()
    n_ctx = getattr(args, "context_parallel", 1)
    if n_ctx > 1:
        from protein_structure_tokenizer_tpu.parallel import cp

        mesh = cp.make_ctx_mesh(n_ctx, devices)
    else:
        mesh = mesh_lib.make_mesh(devices)
    compute_dtype = None
    if getattr(args, "bf16", False):
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16
    buckets = "auto" if getattr(args, "length_buckets", True) else None
    return InferenceRunner(
        cfg, params, mesh, exact_aggregation=args.exact,
        compute_dtype=compute_dtype, length_buckets=buckets,
    )


def setup_logging() -> None:
    # Single shared config path (utils/log.py): %(host)s is resolved lazily
    # per record, so multi-host runs report the right index even when logging
    # was configured before jax.distributed.initialize().
    from protein_structure_tokenizer_tpu.utils.log import setup_logging as _setup

    _setup()
