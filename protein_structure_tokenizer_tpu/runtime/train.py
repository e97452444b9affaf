"""Training driver: data-parallel autoencoder training over a device mesh.

The reference releases losses but no optimizer loop (SURVEY.md §3.4); this
module completes the stack: an optax-based train step jitted over the 1-D
``data`` mesh — batch sharded, parameters/optimizer state replicated,
gradient reduction handled by jit's global-view semantics (psum over ICI).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import optax

from protein_structure_tokenizer_tpu.data.types import TokenizerBatch
from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import Vq3dConfig
from protein_structure_tokenizer_tpu.models.losses import LossConfig, structure_loss
from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
from protein_structure_tokenizer_tpu.utils.params import Params


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    grad_clip_norm: Optional[float] = 1.0
    # warmup_steps > 0 switches the constant rate to warmup + cosine decay
    # over total_steps (like the LM trainer).
    warmup_steps: int = 0
    total_steps: int = 10000
    # Average gradients over k micro-batches before each optimizer update:
    # k x the effective batch within one chip's activation memory.
    grad_accum_steps: int = 1
    loss: LossConfig = LossConfig()


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.warmup_steps > 0:
        rate = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
            end_value=cfg.learning_rate * 0.1,
        )
    else:
        rate = cfg.learning_rate
    chain = []
    if cfg.grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    chain.append(optax.adamw(rate, weight_decay=cfg.weight_decay))
    tx = optax.chain(*chain)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


def loss_fn(
    params: Params,
    model_cfg: Vq3dConfig,
    train_cfg: TrainConfig,
    batch: TokenizerBatch,
    rng: jax.Array,
    mesh=None,
):
    decoded, quant = vq3d.forward(
        params, model_cfg, batch, is_training=True, compute_usage=True, mesh=mesh
    )
    losses = structure_loss(
        train_cfg.loss, decoded, batch.features, batch.graph.nodes_mask, rng
    )
    metrics = {
        "loss": losses["loss"],
        "backbone_fape": losses["backbone_fape"],
        "sidechain_fape": losses["sidechain_fape"],
    }
    if "perplexity" in quant:
        metrics["codebook_perplexity"] = quant["perplexity"]
    return losses["loss"], metrics


def make_train_step(
    model_cfg: Vq3dConfig, train_cfg: TrainConfig, mesh, *, fsdp_state_shardings=None
):
    """Build the jitted sharded train step: (params, opt_state, batch, rng)
    -> (params, opt_state, metrics).

    A mesh with a "ctx" axis (parallel/cp.py) row-shards the quadratic
    tensors — the encoder edge table, the pair track, the IPA logits — in
    BOTH the forward and (by AD transposition of the sharded ops) the
    backward pass: per-chip activation memory for the pair track scales
    1/ctx, the binding constraint for long-chain training.

    ``fsdp_state_shardings`` (a (param, opt_state) sharding pair from
    init_fsdp_train_state) instead pins the train state fully sharded over
    the data axis — FSDP/ZeRO-3, same recipe as runtime/train_lm.py."""
    from protein_structure_tokenizer_tpu.parallel import cp

    optimizer = make_optimizer(train_cfg)
    replicated = mesh_lib.replicated_sharding(mesh)
    batch_shard = mesh_lib.batch_sharding(mesh)
    model_mesh = mesh if cp.has_ctx_axis(mesh) else None
    if fsdp_state_shardings is not None:
        params_sh, opt_sh = fsdp_state_shardings
    else:
        params_sh, opt_sh = replicated, replicated

    @functools.partial(
        jax.jit,
        in_shardings=(params_sh, opt_sh, batch_shard, replicated),
        out_shardings=(params_sh, opt_sh, replicated),
        donate_argnums=(0, 1),
    )
    def train_step(params, opt_state, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(
            params, model_cfg, train_cfg, batch, rng, mesh=model_mesh
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step, optimizer


def init_train_state(
    key: jax.Array, model_cfg: Vq3dConfig, train_cfg: TrainConfig, mesh
) -> Tuple[Params, optax.OptState]:
    params = vq3d.init(key, model_cfg)
    optimizer = make_optimizer(train_cfg)
    opt_state = optimizer.init(params)
    params = mesh_lib.replicate(mesh, params)
    opt_state = mesh_lib.replicate(mesh, opt_state)
    return params, opt_state


def init_fsdp_train_state(
    key: jax.Array, model_cfg: Vq3dConfig, train_cfg: TrainConfig, mesh,
    *, min_shard_elems: Optional[int] = None, params: Optional[Params] = None,
):
    """Fully-sharded tokenizer train state (parallel/fsdp.py; see
    runtime/train_lm.init_fsdp_train_state).  ``params`` lets a warm start
    (released weights) enter sharded directly.  Returns (params, opt_state,
    (param_shardings, opt_state_shardings))."""
    from protein_structure_tokenizer_tpu.parallel import fsdp
    from protein_structure_tokenizer_tpu.runtime.train_lm import (
        _place_stray_opt_leaves,
    )

    if min_shard_elems is None:
        min_shard_elems = fsdp.MIN_SHARD_ELEMS
    if params is None:
        params = vq3d.init(key, model_cfg)
    params = fsdp.shard_tree(mesh, params, min_shard_elems=min_shard_elems)
    opt_state = make_optimizer(train_cfg).init(params)
    opt_state = _place_stray_opt_leaves(opt_state, mesh)
    shardings = jax.tree.map(lambda x: x.sharding, (params, opt_state))
    return params, opt_state, shardings
