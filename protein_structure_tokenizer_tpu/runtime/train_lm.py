"""GPT training over structure-token sequences.

The reference releases only LM *sampling* scripts — the GPT of the paper was
trained out-of-release (SURVEY.md §2.5; /root/reference/scripts/lm has no
optimizer).  This module completes the workflow the paper describes:
tokenize a corpus -> train the LM on the token sequences -> sample novel
sequences -> decode to novel structures.

Data-parallel over the 1-D ``data`` mesh like the tokenizer trainer
(runtime/train.py): batch sharded, params/optimizer replicated, gradient
reduction by jit's global-view semantics.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from protein_structure_tokenizer_tpu.lm import gpt
from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
from protein_structure_tokenizer_tpu.utils.params import Params


@dataclasses.dataclass(frozen=True)
class LmTrainConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    grad_clip_norm: Optional[float] = 1.0
    warmup_steps: int = 100
    total_steps: int = 10000  # cosine decay horizon
    label_smoothing: float = 0.0
    # Average gradients over k micro-batches before each optimizer update.
    grad_accum_steps: int = 1
    # MoE aux-loss weights (only active when the model has expert layers).
    moe_lb_loss_weight: float = 0.01
    moe_z_loss_weight: float = 1e-3


def make_optimizer(cfg: LmTrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=max(cfg.warmup_steps, 1),
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
        end_value=cfg.learning_rate * 0.1,
    )
    chain = []
    if cfg.grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    chain.append(optax.adamw(schedule, weight_decay=cfg.weight_decay))
    tx = optax.chain(*chain)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


def lm_loss(
    params: Params,
    model_cfg: gpt.GptConfig,
    train_cfg: LmTrainConfig,
    tokens: jax.Array,  # (B, T) int32, bos...eos + pad tail
    *,
    mesh=None,
    sequence_parallel: bool = False,
) -> Tuple[jax.Array, dict]:
    """Next-token cross-entropy with pad positions masked out.  MoE models
    additionally pay the router load-balance + z losses (lm/moe.py)."""
    inputs, targets = tokens[:, :-1], tokens[:, 1:]
    fwd = gpt.forward(
        params, model_cfg, inputs, mesh=mesh, sequence_parallel=sequence_parallel
    )
    logits = fwd["logits"]
    mask = (targets != model_cfg.pad_token_id).astype(jnp.float32)
    if train_cfg.label_smoothing > 0:
        onehot = jax.nn.one_hot(targets, model_cfg.vocab_size)
        smooth = optax.smooth_labels(onehot, train_cfg.label_smoothing)
        ce = optax.softmax_cross_entropy(logits, smooth)
    else:
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    denom = jnp.maximum(mask.sum(), 1.0)
    ce_loss = (ce * mask).sum() / denom
    accuracy = ((jnp.argmax(logits, -1) == targets) * mask).sum() / denom
    loss = ce_loss
    metrics = {
        "perplexity": jnp.exp(ce_loss),
        "accuracy": accuracy,
        "tokens": mask.sum(),
    }
    if "moe_lb_loss" in fwd:
        loss = loss + train_cfg.moe_lb_loss_weight * fwd["moe_lb_loss"]
        loss = loss + train_cfg.moe_z_loss_weight * fwd["moe_z_loss"]
        metrics["moe_lb_loss"] = fwd["moe_lb_loss"]
        metrics["moe_z_loss"] = fwd["moe_z_loss"]
    metrics["loss"] = loss
    return loss, metrics


def make_train_step(
    model_cfg: gpt.GptConfig,
    train_cfg: LmTrainConfig,
    mesh,
    *,
    sequence_parallel: bool = False,
    fsdp_state_shardings=None,
):
    """Data-parallel train step; with a "model" mesh axis (parallel/tp.py)
    the blocks run tensor-parallel (params pre-placed by shard_gpt_params,
    shardings inherited from the arguments) and ``sequence_parallel``
    additionally T-shards the residual stream (Megatron-SP).

    ``fsdp_state_shardings`` — a (param_shardings, opt_state_shardings)
    pair from parallel/fsdp.py — pins the train state fully sharded over
    the data axis instead of replicated (ZeRO-3): XLA all-gathers each
    weight at its use site and reduce-scatters its gradient, and the
    optimizer update runs on the local shard only.
    """
    from protein_structure_tokenizer_tpu.parallel import ep, tp

    optimizer = make_optimizer(train_cfg)
    batch_shard = mesh_lib.batch_sharding(mesh)
    tensor_parallel = tp.has_model_axis(mesh)
    expert_parallel = ep.has_expert_axis(mesh)
    # Tensor-/expert-parallel params carry their own shardings; only pure
    # data-parallel pins everything replicated explicitly.
    sharded_params = tensor_parallel or expert_parallel
    if fsdp_state_shardings is not None:
        params_sh, opt_sh = fsdp_state_shardings
        in_shardings = (params_sh, opt_sh, batch_shard)
        out_shardings = (params_sh, opt_sh, None)
    else:
        state_shardings = None if sharded_params else mesh_lib.replicated_sharding(mesh)
        in_shardings = (state_shardings, state_shardings, batch_shard)
        out_shardings = None

    def loss_fn(params, tokens):
        return lm_loss(
            params, model_cfg, train_cfg, tokens,
            mesh=mesh if sharded_params else None,
            sequence_parallel=sequence_parallel,
        )

    @functools.partial(
        jax.jit,
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=(0, 1),
    )
    def train_step(params, opt_state, tokens):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(params, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step, optimizer


def init_train_state(
    key: jax.Array, model_cfg: gpt.GptConfig, train_cfg: LmTrainConfig, mesh
) -> Tuple[Params, optax.OptState]:
    params = gpt.init(key, model_cfg)
    opt_state = make_optimizer(train_cfg).init(params)
    return mesh_lib.replicate(mesh, params), mesh_lib.replicate(mesh, opt_state)


def init_fsdp_train_state(
    key: jax.Array, model_cfg: gpt.GptConfig, train_cfg: LmTrainConfig, mesh,
    *, min_shard_elems: Optional[int] = None,
):
    """Fully-sharded train state (parallel/fsdp.py): params placed with their
    FSDP shardings; Adam moments inherit them via eager ``zeros_like``;
    scalar leaves (step counts) are pinned replicated.

    Returns (params, opt_state, (param_shardings, opt_state_shardings)) —
    pass the sharding pair to ``make_train_step(fsdp_state_shardings=...)``.
    """
    from protein_structure_tokenizer_tpu.parallel import fsdp

    if min_shard_elems is None:
        min_shard_elems = fsdp.MIN_SHARD_ELEMS
    params = fsdp.shard_tree(
        mesh, gpt.init(key, model_cfg), min_shard_elems=min_shard_elems
    )
    opt_state = make_optimizer(train_cfg).init(params)
    opt_state = _place_stray_opt_leaves(opt_state, mesh)
    shardings = jax.tree.map(lambda x: x.sharding, (params, opt_state))
    return params, opt_state, shardings


# ---------------------------------------------------------------------------
# Pipeline-parallel training (parallel/pp.py GPipe schedule)
# ---------------------------------------------------------------------------


def make_pp_train_step(
    model_cfg: gpt.GptConfig,
    train_cfg: LmTrainConfig,
    mesh,
    num_microbatches: int,
):
    """Train step over pipeline-stage-sharded params ({"stages", "rest"}).

    The loss runs the GPipe schedule (parallel/pp.py); its grad is the
    pipelined backward.  Optimizer state mirrors the param shardings (stage
    leaves live only on their stage's devices).
    """
    from protein_structure_tokenizer_tpu.parallel import pp

    optimizer = make_optimizer(train_cfg)
    loss_fn = pp.make_pp_loss_fn(
        model_cfg, mesh, num_microbatches,
        label_smoothing=train_cfg.label_smoothing,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(pp_params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(pp_params, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, pp_params)
        pp_params = optax.apply_updates(pp_params, updates)
        return pp_params, opt_state, {"loss": loss, "perplexity": jnp.exp(loss)}

    return train_step, optimizer


def _place_stray_opt_leaves(opt_state: optax.OptState, mesh) -> optax.OptState:
    """Eager optimizer init: zeros_like moments inherit the param shardings;
    scalar leaves (adam count, schedule step) need explicit mesh placement or
    they sit committed on device 0 and clash with sharded params under jit."""
    from jax.sharding import NamedSharding, PartitionSpec

    mesh_devices = set(np.asarray(mesh.devices).flat)
    replicated = NamedSharding(mesh, PartitionSpec())

    def place(x):
        if isinstance(x, jax.Array) and set(x.sharding.device_set) == mesh_devices:
            return x
        return jax.device_put(x, replicated)

    return jax.tree.map(place, opt_state)


def init_pp_train_state(
    key: jax.Array,
    model_cfg: gpt.GptConfig,
    train_cfg: LmTrainConfig,
    mesh,
) -> Tuple[dict, optax.OptState]:
    from protein_structure_tokenizer_tpu.parallel import pp

    params = gpt.init(key, model_cfg)
    pp_params = pp.place_pp_params(params, model_cfg, mesh)
    opt_state = _place_stray_opt_leaves(make_optimizer(train_cfg).init(pp_params), mesh)
    return pp_params, opt_state


def init_ep_train_state(
    key: jax.Array,
    model_cfg: gpt.GptConfig,
    train_cfg: LmTrainConfig,
    mesh,
) -> Tuple[Params, optax.OptState]:
    """Expert-parallel MoE training state on a ("data", "expert") mesh:
    stacked expert weights (and their adam moments) shard over "expert"."""
    from protein_structure_tokenizer_tpu.parallel import ep

    params = ep.shard_moe_params(gpt.init(key, model_cfg), mesh)
    opt_state = _place_stray_opt_leaves(make_optimizer(train_cfg).init(params), mesh)
    return params, opt_state


def init_tp_train_state(
    key: jax.Array,
    model_cfg: gpt.GptConfig,
    train_cfg: LmTrainConfig,
    mesh,
) -> Tuple[Params, optax.OptState]:
    """Megatron tensor-parallel training state on a ("data", "model") mesh."""
    from protein_structure_tokenizer_tpu.parallel import tp

    params = tp.shard_gpt_params(gpt.init(key, model_cfg), mesh)
    opt_state = _place_stray_opt_leaves(make_optimizer(train_cfg).init(params), mesh)
    return params, opt_state


# ---------------------------------------------------------------------------
# Token-sequence dataset
# ---------------------------------------------------------------------------


def pack_sequence(
    tokens: np.ndarray, cfg: gpt.GptConfig, block_size: Optional[int] = None
) -> np.ndarray:
    """[bos] + tokens + [eos], right-padded with pad to block_size."""
    block = block_size or cfg.max_position_embeddings
    tokens = np.asarray(tokens, np.int32).reshape(-1)[: block - 2]
    seq = np.full((block,), cfg.pad_token_id, np.int32)
    seq[0] = cfg.bos_token_id
    seq[1 : 1 + len(tokens)] = tokens
    seq[1 + len(tokens)] = cfg.eos_token_id
    return seq


class TokenSequenceDataset:
    """Shuffled stream of packed token batches from ``*_tokens.npy`` files
    (the tokenize CLI's output format) or any .npy of int token ids."""

    def __init__(
        self,
        paths: Sequence[str],
        cfg: gpt.GptConfig,
        *,
        seed: int = 0,
        block_size: Optional[int] = None,
    ):
        if not paths:
            raise ValueError("empty token dataset")
        self.cfg = cfg
        self.seed = seed
        self.sequences = np.stack(
            [pack_sequence(np.load(p), cfg, block_size) for p in paths]
        )

    @classmethod
    def from_dir(cls, directory: str, cfg: gpt.GptConfig, **kw) -> "TokenSequenceDataset":
        paths = sorted(
            os.path.join(directory, f)
            for f in os.listdir(directory)
            if f.endswith(".npy")
        )
        return cls(paths, cfg, **kw)

    def __len__(self) -> int:
        return len(self.sequences)

    def batches(
        self, global_batch: int, *, start_step: int = 0, local: slice = slice(None)
    ) -> Iterator[np.ndarray]:
        n = len(self.sequences)
        step, epoch = 0, 0
        while True:
            order = np.random.RandomState(self.seed + epoch).permutation(n)
            n_batches = max(1, -(-n // global_batch))
            padded = np.resize(order, n_batches * global_batch)
            for b in range(n_batches):
                if step < start_step:
                    step += 1
                    continue
                idx = padded[b * global_batch : (b + 1) * global_batch][local]
                yield self.sequences[idx]
                step += 1
            epoch += 1
