"""Pipeline parallelism for the GPT LM (GPipe schedule, shard_map + ppermute).

The reference distributes only over the batch (jax.pmap data parallelism,
/root/reference/scripts/inference_runner.py:191-246); its 20-layer GPT always
runs whole on every device.  This module adds the TPU-native pipeline axis:
a ``Mesh(("data", "pipe"))`` where the decoder stack is split into
``n_pipe`` contiguous stages, one stage per device along "pipe", and
microbatches stream through the classic GPipe schedule:

  tick t:   stage s computes its layers on microbatch (t - s)
            then ``ppermute``s the activation to stage s+1 over ICI.

Everything runs inside ONE ``jax.shard_map`` region so the schedule is a
``lax.scan`` over ticks — a single compiled program, no host round-trips.
The region is differentiable (ppermute transposes to the reverse ppermute),
so the same schedule serves training: :func:`make_pp_loss_fn` computes the
next-token cross-entropy on the last stage and psums the scalar, giving
backward-pass bubbles that mirror the forward schedule.

Composition with data parallelism: microbatch rows are sharded over "data",
stages over "pipe"; stage parameters are replicated across "data" (their
cotangents are psum'd over "data" by the shard_map transpose) and the
embedding/head/final-norm leaves are replicated everywhere.

Scale note: with B=microbatches M and S stages the bubble fraction is
(S-1)/(M+S-1); choose M >= 4S for >80% pipeline utilization.  Logits are
returned replicated (a psum from the last stage) — cheap at structure-token
vocab sizes; the loss-form entry point only psums a scalar.
"""
from __future__ import annotations

import functools
import inspect
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib

from protein_structure_tokenizer_tpu.lm import gpt
from protein_structure_tokenizer_tpu.models.layers import layer_norm, linear, rms_norm
from protein_structure_tokenizer_tpu.utils.params import Params

DATA_AXIS = "data"
PIPE_AXIS = "pipe"


def make_pp_mesh(
    n_pipe: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Mesh(("data", "pipe")): trailing (fastest-varying = ICI-adjacent) axis
    carries the stage-to-stage ppermute traffic."""
    return mesh_lib.make_hybrid_mesh(PIPE_AXIS, n_pipe, devices)


def _shard_map(f, mesh, in_specs, out_specs):
    """jax.shard_map with replication checking off (the schedule branches on
    lax.axis_index, which defeats static replication inference) across the
    check_rep/check_vma API rename."""
    return mesh_lib.shard_map_compat(f, mesh, in_specs, out_specs)


# ---------------------------------------------------------------------------
# Parameter layout
# ---------------------------------------------------------------------------

_LAYER_PREFIX = "gpt_decoder/gpt_decoder_layer_"


def split_stage_params(params: Params, cfg: gpt.GptConfig) -> Tuple[dict, Params]:
    """(stacked, rest): per-layer leaves stacked on a new leading layer axis.

    ``stacked`` maps the relative scope (the part after
    ``gpt_decoder/gpt_decoder_layer_{i}/``) to leaves of shape (L, ...);
    ``rest`` holds the embedding / final norm / LM head scopes verbatim.
    """
    rel_scopes: dict[str, dict] = {}
    rest: Params = {}
    for scope, leaves in params.items():
        if scope.startswith(_LAYER_PREFIX):
            tail = scope[len(_LAYER_PREFIX):]
            idx_str, rel = tail.split("/", 1)
            # rel is relative to "gpt_decoder_layer_{i}/" and always starts
            # with the haiku "~/" segment; strip it so the stacked keys match
            # exactly what gpt.decoder_layer indexes.
            assert rel.startswith("~/"), scope
            rel_scopes.setdefault(rel[2:], {})[int(idx_str)] = leaves
        else:
            rest[scope] = leaves
    stacked = {}
    for rel, by_layer in rel_scopes.items():
        assert len(by_layer) == cfg.num_layers, (rel, sorted(by_layer))
        names = by_layer[0].keys()
        stacked[rel] = {
            n: jnp.stack([by_layer[i][n] for i in range(cfg.num_layers)])
            for n in names
        }
    return stacked, rest


def merge_stage_params(stacked: dict, rest: Params, cfg: gpt.GptConfig) -> Params:
    """Inverse of :func:`split_stage_params` (host-side, for checkpoint IO)."""
    params: Params = dict(rest)
    for rel, leaves in stacked.items():
        for i in range(cfg.num_layers):
            params.setdefault(f"{_LAYER_PREFIX}{i}/~/{rel}", {}).update(
                {n: np.asarray(a[i]) for n, a in leaves.items()}
            )
    return params


def place_pp_params(params: Params, cfg: gpt.GptConfig, mesh: Mesh) -> dict:
    """{"stages": stacked leaves sharded (pipe, ...), "rest": replicated}."""
    stacked, rest = split_stage_params(params, cfg)
    stage_sh = NamedSharding(mesh, P(PIPE_AXIS))
    repl = NamedSharding(mesh, P())
    stages = jax.tree.map(lambda a: jax.device_put(a, stage_sh), stacked)
    rest = jax.tree.map(lambda a: jax.device_put(a, repl), rest)
    return {"stages": stages, "rest": rest}


def _check_batch(b: int, num_microbatches: int, mesh: Mesh) -> None:
    n_data = mesh.shape[DATA_AXIS]
    if b % num_microbatches or (b // num_microbatches) % n_data:
        raise ValueError(
            f"batch {b} must factor as M={num_microbatches} microbatches of "
            f"rows divisible by the data axis ({n_data})"
        )


# ---------------------------------------------------------------------------
# The schedule
# ---------------------------------------------------------------------------


def _local_layers(stage_params: dict, cfg: gpt.GptConfig, x, mask):
    """Scan this stage's (L/S, ...) stacked layers over the activation."""

    def body(h, layer_p):
        h, _, _ = gpt.decoder_layer(layer_p, cfg, h, mask)
        return h, None

    x, _ = jax.lax.scan(body, x, stage_params)
    return x


def _head(rest: Params, cfg: gpt.GptConfig, x):
    if cfg.norm_type == "layer_norm":
        x = layer_norm(rest["gpt_decoder/~/final_layer_norm"], x)
    else:
        x = rms_norm(rest["gpt_decoder/~/final_RMS_norm"], x)
    return linear(rest["gpt_decoder/~/simple_lm_head/~/lm_final_fc"], x)


def _pp_logits_local(cfg: gpt.GptConfig, n_pipe: int, stages, rest, token_ids):
    """Inside-shard_map body: token_ids (M, mB_local, T) -> per-microbatch
    last-stage logits (M, mB_local, T, V), psum-replicated over "pipe".

    Embedding lookups run once per microbatch BEFORE the scan and the LM head
    once per microbatch AFTER it — inside the tick they would re-execute on
    every stage every tick, S*(M+S-1) times instead of M (SPMD runs the same
    program on all stages; the where() only masks the result, not the work).
    The tick psums (M, mb, T, E) activations, cheaper than (..., vocab).
    """
    s_idx = jax.lax.axis_index(PIPE_AXIS)
    num_micro, mb, t = token_ids.shape
    mask = gpt.build_causal_mask(1, t)
    embeddings = rest["gpt_decoder/~/token_embed"]["embeddings"]
    emb_all = jnp.take(embeddings, token_ids, axis=0)  # (M, mb, T, E)
    perm = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]

    def tick(buf, tk):
        micro = jnp.clip(tk, 0, num_micro - 1)
        x = jnp.where(s_idx == 0, emb_all[micro], buf)
        y = _local_layers(stages, cfg, x, mask)
        out = jnp.where(s_idx == n_pipe - 1, y, 0.0)
        nxt = jax.lax.ppermute(y, PIPE_AXIS, perm)
        return nxt, out

    buf0 = jnp.zeros((mb, t, cfg.embed_dim), jnp.float32)
    _, outs = jax.lax.scan(tick, buf0, jnp.arange(num_micro + n_pipe - 1))
    # Tick t emits microbatch t-(S-1) from the last stage; earlier ticks are
    # warm-up bubbles.  Only the last stage contributed nonzero rows.
    acts = jax.lax.psum(outs[n_pipe - 1 :], PIPE_AXIS)  # (M, mb, T, E)
    return _head(rest, cfg, acts)


def make_pp_forward(cfg: gpt.GptConfig, mesh: Mesh, num_microbatches: int):
    """jitted (pp_params, token_ids (B, T)) -> logits (B, T, vocab).

    B must divide into ``num_microbatches`` x (rows per data shard).
    """
    n_pipe = mesh.shape[PIPE_AXIS]
    if cfg.num_layers % n_pipe:
        raise ValueError(
            f"num_layers={cfg.num_layers} not divisible by pipe={n_pipe}"
        )
    if cfg.num_experts:
        raise NotImplementedError(
            "pipeline parallelism does not support MoE layers (the GPipe "
            "stage scan would drop the load-balance aux loss); use expert "
            "parallelism (parallel/ep.py) for MoE GPTs"
        )

    body = _shard_map(
        functools.partial(_pp_logits_local, cfg, n_pipe),
        mesh,
        in_specs=(P(PIPE_AXIS), P(), P(None, DATA_AXIS, None)),
        out_specs=P(None, DATA_AXIS, None, None),
    )

    @jax.jit
    def forward(pp_params: dict, token_ids: jax.Array) -> jax.Array:
        b, t = token_ids.shape
        _check_batch(b, num_microbatches, mesh)
        micro = token_ids.reshape(num_microbatches, b // num_microbatches, t)
        logits = body(pp_params["stages"], pp_params["rest"], micro)
        return logits.reshape(b, t, -1)

    return forward


def make_pp_loss_fn(
    cfg: gpt.GptConfig,
    mesh: Mesh,
    num_microbatches: int,
    *,
    label_smoothing: float = 0.0,
):
    """(pp_params, tokens (B, T+1)) -> mean next-token cross-entropy.

    The CE is computed inside the shard_map region on the last stage's
    logits (pad targets masked, optional label smoothing), psum'd as two
    scalars (loss numerator and token count) — no logit gather off the
    pipeline.  Differentiable: ``jax.grad`` of this is the GPipe backward
    schedule.
    """
    n_pipe = mesh.shape[PIPE_AXIS]
    if cfg.num_layers % n_pipe:
        raise ValueError(
            f"num_layers={cfg.num_layers} not divisible by pipe={n_pipe}"
        )
    if cfg.num_experts:
        raise NotImplementedError(
            "pipeline parallelism does not support MoE layers (the GPipe "
            "stage scan would drop the load-balance aux loss); use expert "
            "parallelism (parallel/ep.py) for MoE GPTs"
        )

    def local(stages, rest, inputs, targets):
        logits = _pp_logits_local(cfg, n_pipe, stages, rest, inputs)
        mask = (targets != cfg.pad_token_id).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        if label_smoothing > 0:
            # CE against optax.smooth_labels targets:
            # onehot*(1-eps) + eps/V  ->  -(1-eps+eps/V)*logp_t - (eps/V)*sum(logp).
            eps = label_smoothing
            v = cfg.vocab_size
            tok_ll = (1.0 - eps) * tok_ll + (eps / v) * jnp.sum(logp, axis=-1)
        num = -jnp.sum(tok_ll * mask)
        den = jnp.sum(mask)
        num = jax.lax.psum(num, DATA_AXIS)
        den = jax.lax.psum(den, DATA_AXIS)
        return num / jnp.maximum(den, 1.0)

    body = _shard_map(
        local,
        mesh,
        in_specs=(
            P(PIPE_AXIS),
            P(),
            P(None, DATA_AXIS, None),
            P(None, DATA_AXIS, None),
        ),
        out_specs=P(),
    )

    def loss_fn(pp_params: dict, tokens: jax.Array) -> jax.Array:
        b = tokens.shape[0]
        _check_batch(b, num_microbatches, mesh)
        inputs = tokens[:, :-1].reshape(num_microbatches, b // num_microbatches, -1)
        targets = tokens[:, 1:].reshape(num_microbatches, b // num_microbatches, -1)
        return body(pp_params["stages"], pp_params["rest"], inputs, targets)

    return loss_fn
