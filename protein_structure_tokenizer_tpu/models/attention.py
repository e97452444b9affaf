"""Gated multi-head attention, transitions and the cross-attention scaler.

Behavioral parity with /root/reference/structure_tokenizer/model/modules.py
(Attention 271-382, CrossAttention 385-424, Transition 199-262,
CrossAttentionScaler 427-636), TPU-first implementation notes:

  * The 3-block scaler stack runs as ``jax.lax.scan`` over parameters stacked
    on a leading axis — the same parameter layout the reference's
    ``layer_stack`` produces, so released checkpoints load unchanged, while
    compile time stays constant in depth.
  * Everything is natively batched (B, ..., D); masks enter attention as an
    additive ``1e9 * (mask - 1)`` bias exactly like the reference.
  * ``jax.checkpoint`` optionally rematerializes each scaler block
    (the reference's ``use_remat``) to trade FLOPs for HBM during training.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.models.layers import (
    layer_norm_fast,
    af2_linear,
    af2_linear_init_leaves,
    layer_norm,
    layer_norm_1pass,
    linear,
    linear_init,
    norm_init,
)
from protein_structure_tokenizer_tpu.models.posenc import sinusoidal_features
from protein_structure_tokenizer_tpu.utils.params import Params, subtree, with_prefix
from protein_structure_tokenizer_tpu.models.init import variance_scaling_truncated_fan_in


@dataclasses.dataclass(frozen=True)
class AttentionConfig:
    num_head: int
    gating: bool = True
    key_dim: Optional[int] = None
    value_dim: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class TransitionConfig:
    num_intermediate_factor: int = 2
    # Low-memory evaluation: apply the MLP in chunks of this many rows along
    # the sequence axis (the reference's inference_subbatch, mapping.py:214).
    # None = whole-sequence (fastest; right for N <= 512 on TPU).
    chunk_size: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class ScalerConfig:
    out_emb_size: int
    max_out_len: int
    sc_num_block: int = 3
    use_original_posenc: bool = False
    use_global_node: int = 0
    positional_encoding_dimension: int = 128
    cross_attn: AttentionConfig = AttentionConfig(num_head=4)
    resampled_transition: TransitionConfig = TransitionConfig()
    original_transition: TransitionConfig = TransitionConfig()
    use_remat: bool = False


def attention(p: Params, cfg: AttentionConfig, q_data, m_data, bias) -> jax.Array:
    """Gated multihead attention. q_data (B,Q,Cq), m_data (B,K,Cm), bias (B,H,Q,K)."""
    key_dim_total = cfg.key_dim if cfg.key_dim is not None else q_data.shape[-1]
    key_dim = key_dim_total // cfg.num_head

    q = jnp.einsum("bqa,ahc->bqhc", q_data, p["query_w"]) * key_dim ** (-0.5)
    k = jnp.einsum("bka,ahc->bkhc", m_data, p["key_w"])
    v = jnp.einsum("bka,ahc->bkhc", m_data, p["value_w"])
    logits = jnp.einsum("bqhc,bkhc->bhqk", q, k) + bias
    weights = jax.nn.softmax(logits)
    weighted = jnp.einsum("bhqk,bkhc->bqhc", weights, v)

    if cfg.gating:
        gate = jnp.einsum("bqc,chv->bqhv", q_data, p["gating_w"]) + p["gating_b"]
        weighted = weighted * jax.nn.sigmoid(gate)

    return jnp.einsum("bqhc,hco->bqo", weighted, p["output_w"]) + p["output_b"]


def attention_init(key, cfg: AttentionConfig, q_dim: int, m_dim: int, out_dim: int) -> Params:
    key_dim_total = cfg.key_dim if cfg.key_dim is not None else q_dim
    value_dim_total = cfg.value_dim if cfg.value_dim is not None else m_dim
    kd = key_dim_total // cfg.num_head
    vd = value_dim_total // cfg.num_head
    ks = jax.random.split(key, 4)
    leaves = {
        "query_w": variance_scaling_truncated_fan_in(ks[0], (q_dim, cfg.num_head, kd)),
        "key_w": variance_scaling_truncated_fan_in(ks[1], (m_dim, cfg.num_head, kd)),
        "value_w": variance_scaling_truncated_fan_in(ks[2], (m_dim, cfg.num_head, vd)),
        "output_w": variance_scaling_truncated_fan_in(ks[3], (cfg.num_head, vd, out_dim)),
        "output_b": jnp.zeros((out_dim,), jnp.float32),
    }
    if cfg.gating:
        leaves["gating_w"] = jnp.zeros((q_dim, cfg.num_head, vd), jnp.float32)
        leaves["gating_b"] = jnp.ones((cfg.num_head, vd), jnp.float32)
    return {"": leaves}


def cross_attention(p: Params, cfg: AttentionConfig, query, attn_mask, data) -> jax.Array:
    """LN both tracks then attend; additive mask bias 1e9*(mask-1)."""
    bias = 1e9 * (attn_mask - 1.0)
    query = layer_norm(p["query_norm"], query)
    data = layer_norm(p["data_norm"], data)
    return attention(p["attention"], cfg, query, data, bias)


def cross_attention_init(key, cfg: AttentionConfig, q_dim: int, m_dim: int) -> Params:
    k0, k1 = jax.random.split(key)
    return {
        "query_norm": norm_init(q_dim),
        "data_norm": norm_init(m_dim),
        **with_prefix(attention_init(k0, cfg, q_dim, m_dim, q_dim), "attention"),
    }


def transition(
    p: Params, cfg: TransitionConfig, act: jax.Array, *, one_pass_ln: bool = False,
    ln_pallas: bool = False,
) -> jax.Array:
    """AF2 MSATransition: LN -> Linear(relu) -> relu -> Linear.

    ``one_pass_ln`` uses single-read LN statistics (fast path for HBM-bound
    pair tensors; exact paths keep the reference's two-pass form);
    ``ln_pallas`` additionally selects the single-pass Pallas LN for bf16
    tensors (ops/ln_kernels.py; caller gates on TPU + single-device)."""

    def body(x):
        if one_pass_ln and ln_pallas:
            x = layer_norm_fast(p["input_layer_norm"], x, use_pallas=True)
        else:
            ln = layer_norm_1pass if one_pass_ln else layer_norm
            x = ln(p["input_layer_norm"], x)
        x = af2_linear(p["transition1"], x)
        x = jax.nn.relu(x)
        return af2_linear(p["transition2"], x)

    if cfg.chunk_size is not None:
        from protein_structure_tokenizer_tpu.utils.chunking import chunked_apply

        return chunked_apply(body, act, chunk_size=cfg.chunk_size, axis=-2)
    return body(act)


def transition_init(key, cfg: TransitionConfig, dim: int) -> Params:
    inter = int(dim * cfg.num_intermediate_factor)
    k1, k2 = jax.random.split(key)
    return {
        "input_layer_norm": norm_init(dim),
        "transition1": af2_linear_init_leaves(k1, (dim,), (inter,), initializer="relu"),
        "transition2": af2_linear_init_leaves(k2, (inter,), (dim,)),
    }


# ---------------------------------------------------------------------------
# Cross-attention scaler (the down/up resampler)
# ---------------------------------------------------------------------------


def _stack_scan(params: Params, num_blocks: int, body, carry):
    """Scan ``body`` over per-block slices of leading-stacked params."""
    del num_blocks  # implicit in the leading axis of every leaf
    stacked = {s: dict(l) for s, l in params.items()}

    def step(c, layer_params):
        return body(layer_params, c), None

    carry, _ = jax.lax.scan(step, carry, stacked)
    return carry


def cross_attention_scaler(
    params: Params,
    cfg: ScalerConfig,
    single_act: jax.Array,  # (B, L_in, C)
    attn_mask: jax.Array,  # (B, H, T_out, L_in)
    output_mask: jax.Array,  # unused by the math; kept for API parity
    input_mask: jax.Array,  # unused by the math; kept for API parity
    *,
    out_len: Optional[int] = None,
    in_pos_base: Optional[int] = None,
) -> jax.Array:
    """Learned-query resampler: T_out sinusoidal queries cross-attend L_in keys.

    Returns (B, T_out, out_emb_size).

    Length-bucketing hooks (runtime arrays shorter than the configured
    lengths, bit-identical rows — see runner length buckets): ``out_len``
    emits only the first ``out_len`` queries (their sinusoidal PE base stays
    ``max_out_len``); ``in_pos_base`` overrides the input-track PE base when
    ``use_original_posenc`` (the input may be padded to a shorter bucket).
    """
    del output_mask, input_mask
    batch = single_act.shape[0]
    # The scan carry is pinned to the incoming compute dtype: inner f32
    # islands (softmax) may locally promote, and the sinusoidal queries are
    # built in f32 — without the casts a bf16 compute policy would silently
    # upcast the whole resampled track (and everything downstream) to f32.
    dtype = single_act.dtype

    original = single_act
    if cfg.use_original_posenc:
        in_dim = cfg.positional_encoding_dimension
        length = single_act.shape[-2]
        in_pos = sinusoidal_features(
            jnp.arange(length), in_pos_base or length, in_dim
        )
        in_pos = jnp.broadcast_to(in_pos[None], (batch,) + in_pos.shape)
        original = jnp.concatenate([in_pos.astype(dtype), single_act], axis=-1)
        original = linear(params["linear_proj_original"], original)

    offset = cfg.use_global_node if cfg.use_global_node else 0
    t_out = cfg.max_out_len + offset
    resampled = sinusoidal_features(
        jnp.arange(out_len + offset if out_len else t_out), t_out, cfg.out_emb_size
    )
    resampled = jnp.broadcast_to(resampled[None], (batch,) + resampled.shape)
    resampled = resampled.astype(dtype)

    iter_params = subtree(params, "cross_attn_scaler_iteration")

    def block(layer_p: Params, carry):
        original, resampled = carry
        resampled = resampled + cross_attention(
            subtree(layer_p, "cross_attention"), cfg.cross_attn, resampled, attn_mask, original
        )
        resampled = resampled + transition(
            subtree(layer_p, "resampled_transition"), cfg.resampled_transition, resampled
        )
        original = original + transition(
            subtree(layer_p, "original_transition"), cfg.original_transition, original
        )
        return (original.astype(dtype), resampled.astype(dtype))

    if cfg.use_remat:
        block = jax.checkpoint(block)

    original, resampled = _stack_scan(
        iter_params, cfg.sc_num_block, block, (original, resampled)
    )
    return resampled


def cross_attention_scaler_init(key, cfg: ScalerConfig, in_dim: int) -> Params:
    params: Params = {}
    k_proj, k_xattn, k_rt, k_ot = jax.random.split(key, 4)
    track_dim = cfg.out_emb_size if cfg.use_original_posenc else in_dim
    if cfg.use_original_posenc:
        params["linear_proj_original"] = linear_init(
            k_proj, cfg.positional_encoding_dimension + in_dim, cfg.out_emb_size
        )

    block: Params = {}
    block.update(
        with_prefix(
            cross_attention_init(k_xattn, cfg.cross_attn, cfg.out_emb_size, track_dim),
            "cross_attention",
        )
    )
    block.update(
        with_prefix(
            transition_init(k_rt, cfg.resampled_transition, cfg.out_emb_size),
            "resampled_transition",
        )
    )
    block.update(
        with_prefix(
            transition_init(k_ot, cfg.original_transition, track_dim),
            "original_transition",
        )
    )
    # Stack every leaf over the block axis (layer_stack layout).
    stacked = {
        scope: {
            name: jnp.broadcast_to(leaf[None], (cfg.sc_num_block,) + leaf.shape).copy()
            for name, leaf in leaves.items()
        }
        for scope, leaves in block.items()
    }
    params.update(with_prefix(stacked, "cross_attn_scaler_iteration"))
    return params
