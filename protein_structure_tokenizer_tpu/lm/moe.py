"""Mixture-of-Experts FFN for the token GPT (expert parallelism).

The reference LM is a dense 20-layer GPT (/root/reference/scripts/lm/
gpt_layer.py:529-565 — a single swiGLU MLP per block); scaling the token LM
past one chip's FLOP budget needs sparse capacity, so this module adds a
GShard/Switch-style MoE FFN as a drop-in replacement for the dense MLP:

  * **router**: per-token softmax over ``num_experts`` logits (f32), top-k
    selection with renormalized gates;
  * **capacity + dense dispatch**: each expert processes at most
    ``C = ceil(capacity_factor * k * T / num_experts)`` tokens per sequence
    (over-capacity tokens fall through on the residual path).  Dispatch and
    combine are ONE-HOT EINSUMS — (B, T, E, C) tensors contracted on the MXU,
    no scatter/gather, no dynamic shapes — the canonical TPU formulation
    (GShard, arXiv:2006.16668);
  * **stacked experts**: weights live as (E, d_model, d_ff) stacks so a
    single batched einsum runs every expert, and the leading axis shards
    over the "expert" mesh axis (parallel/ep.py) — GSPMD inserts the
    all-to-alls around the dispatch/combine contractions;
  * **aux losses**: the standard load-balancing loss (mean fraction-routed x
    mean router-prob, scaled by E) plus a router z-loss, returned to the
    trainer through the forward's aux channel.

With T=1 (KV-cached decoding) capacity degrades gracefully to 1 slot per
expert, which is exact: a single token occupies at most one slot everywhere.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.models.init import variance_scaling_truncated_fan_in
from protein_structure_tokenizer_tpu.utils.params import Params


@dataclasses.dataclass(frozen=True)
class MoeDims:
    num_experts: int
    num_selected: int
    capacity: int


def expert_capacity(num_experts: int, num_selected: int, seq_len: int,
                    capacity_factor: float) -> int:
    """Per-expert token slots for one sequence; >=1 so T=1 decoding works."""
    return max(1, math.ceil(capacity_factor * num_selected * seq_len / num_experts))


def router(
    p: Params, x: jax.Array, dims: MoeDims, valid: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Top-k routing. x (B, T, M) -> (dispatch (B,T,E,C) bool-ish f32,
    combine (B,T,E,C) f32 gates, aux load-balance loss, router z-loss).

    Router math runs in f32 regardless of the compute dtype — routing
    decisions must not flip under bf16 policies.

    ``valid`` (B, T) excludes pad positions completely: they claim no
    capacity slots, contribute zero to the combine, and are left out of the
    load-balance / z statistics (otherwise padded batches steer expert
    balance toward garbage tokens).
    """
    logits = jnp.einsum(
        "btm,me->bte", x.astype(jnp.float32), p["w"].astype(jnp.float32)
    )
    probs = jax.nn.softmax(logits, axis=-1)  # (B, T, E)
    if valid is None:
        valid = jnp.ones(x.shape[:2], jnp.float32)
    valid = valid.astype(jnp.float32)

    # Iterative top-k: per choice, argmax -> one-hot -> mask for next choice.
    # Pad rows are zeroed at selection, so every later use (gates, capacity
    # cumsums, dispatch/combine, lb stats) sees them as routed nowhere.
    remaining = probs
    choice_onehots, choice_gates = [], []
    for _ in range(dims.num_selected):
        idx = jnp.argmax(remaining, axis=-1)
        onehot = jax.nn.one_hot(idx, dims.num_experts, dtype=jnp.float32)
        onehot = onehot * valid[..., None]
        choice_onehots.append(onehot)
        choice_gates.append((remaining * onehot).sum(-1))
        remaining = remaining * (1.0 - onehot)

    gates = jnp.stack(choice_gates, axis=-1)  # (B, T, k)
    gates = gates / jnp.maximum(gates.sum(-1, keepdims=True), 1e-9)

    # Capacity positions: cumulative count of earlier tokens routed to the
    # same expert, counting earlier CHOICES of the same token first (choice 0
    # claims slots before choice 1 at the same position, matching GShard's
    # priority ordering).
    dispatch = jnp.zeros(
        x.shape[:2] + (dims.num_experts, dims.capacity), jnp.float32
    )
    combine = jnp.zeros_like(dispatch)
    counts = jnp.zeros(x.shape[:1] + (dims.num_experts,), jnp.float32)  # (B, E)
    for choice in range(dims.num_selected):
        onehot = choice_onehots[choice]  # (B, T, E)
        # Position of each token within its expert's buffer: tokens earlier in
        # T (all their choices) + earlier choices of this token.
        prior = jnp.cumsum(onehot, axis=1) - onehot  # earlier tokens, this choice
        pos = prior + counts[:, None, :]  # (B, T, E)
        fits = pos < dims.capacity
        slot = jax.nn.one_hot(pos.astype(jnp.int32), dims.capacity, dtype=jnp.float32)
        mask = onehot * fits.astype(jnp.float32)  # (B, T, E)
        dispatch = dispatch + mask[..., None] * slot
        combine = combine + (gates[..., choice][..., None] * mask)[..., None] * slot
        counts = counts + onehot.sum(axis=1)

    # Load-balancing loss over the FIRST choice (Switch convention): E *
    # mean_e(fraction of VALID tokens whose top-1 is e) . (mean router prob
    # for e over valid tokens).
    denom = jnp.maximum(valid.sum(), 1.0)
    top1 = choice_onehots[0]  # already valid-masked
    frac = top1.sum(axis=(0, 1)) / denom  # (E,)
    prob = (probs * valid[..., None]).sum(axis=(0, 1)) / denom
    lb_loss = dims.num_experts * jnp.sum(frac * prob)
    z_loss = (jax.nn.logsumexp(logits, axis=-1) ** 2 * valid).sum() / denom
    return dispatch, combine, lb_loss, z_loss


def moe_mlp(
    p: Params,
    x: jax.Array,  # (B, T, M)
    *,
    num_experts: int,
    num_selected: int,
    capacity_factor: float,
    activation,
    use_glu: bool,
    mesh=None,
    valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, dict]:
    """The MoE block: route -> dispatch -> stacked-expert FFN -> combine.

    Expert weights: ``p["experts"]`` holds ``w_gate``/``w_value`` (or ``w1``)
    of shape (E, M, F) and ``w2`` (E, F, M); the leading axis shards over the
    "expert" mesh axis (parallel/ep.py) so each chip holds E/ep experts and
    GSPMD moves tokens with all-to-alls around the dispatch/combine einsums.
    """
    from protein_structure_tokenizer_tpu.parallel import ep

    b, t, m = x.shape
    dims = MoeDims(
        num_experts=num_experts,
        num_selected=num_selected,
        capacity=expert_capacity(num_experts, num_selected, t, capacity_factor),
    )
    dispatch, combine, lb_loss, z_loss = router(p["router"], x, dims, valid=valid)
    dispatch = dispatch.astype(x.dtype)
    combine = combine.astype(x.dtype)

    # (B,T,E,C) x (B,T,M) -> (E, B, C, M): expert-major so the expert axis is
    # leading for the stacked matmuls (and for the "expert" sharding).
    xin = jnp.einsum("btec,btm->ebcm", dispatch, x)
    xin = ep.constrain(xin, mesh, ep.TOKENS_SPEC)

    exp = p["experts"]
    if use_glu:
        h1 = jnp.einsum("ebcm,emf->ebcf", xin, exp["w_gate"].astype(x.dtype))
        h2 = jnp.einsum("ebcm,emf->ebcf", xin, exp["w_value"].astype(x.dtype))
        h = activation(h1) * h2
    else:
        h = activation(jnp.einsum("ebcm,emf->ebcf", xin, exp["w1"].astype(x.dtype)))
    h = ep.constrain(h, mesh, ep.HIDDEN_SPEC)
    yexp = jnp.einsum("ebcf,efm->ebcm", h, exp["w2"].astype(x.dtype))
    yexp = ep.constrain(yexp, mesh, ep.TOKENS_SPEC)

    y = jnp.einsum("btec,ebcm->btm", combine, yexp)
    aux = {"moe_lb_loss": lb_loss, "moe_z_loss": z_loss}
    return y, aux


def init_moe_params(
    key, *, num_experts: int, embed_dim: int, ffn_dim: int, use_glu: bool
) -> Params:
    """Leaves for one MoE layer (scoped under ``.../moe`` by the caller)."""
    k_r, k_1, k_2, k_3 = jax.random.split(key, 4)
    experts = {}
    if use_glu:
        experts["w_gate"] = _stacked_init(k_1, num_experts, (embed_dim, ffn_dim))
        experts["w_value"] = _stacked_init(k_3, num_experts, (embed_dim, ffn_dim))
    else:
        experts["w1"] = _stacked_init(k_1, num_experts, (embed_dim, ffn_dim))
    experts["w2"] = _stacked_init(k_2, num_experts, (ffn_dim, embed_dim))
    return {
        "router": {
            "w": variance_scaling_truncated_fan_in(k_r, (embed_dim, num_experts))
        },
        "experts": experts,
    }


def _stacked_init(key, num_experts: int, shape) -> jax.Array:
    keys = jax.random.split(key, num_experts)
    return jnp.stack(
        [variance_scaling_truncated_fan_in(k, shape) for k in keys]
    )
