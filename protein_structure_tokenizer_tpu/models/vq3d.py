"""Vq3D — the structure tokenizer model (encoder / FSQ / decoder assembly).

Functional, natively-batched re-implementation of
/root/reference/structure_tokenizer/model/model.py:44-572 with parameter
scopes byte-identical to the reference checkpoints (see utils/params.py), so
the released InstaDeep weights hydrate this model directly.

Public entry points mirror the reference API surface:
  encode, quantize_embedding, encode_and_quantize, decode,
  decode_and_make_structure, forward (full autoencoder), indexes_to_codes.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.data.types import ProteinGraphBatch, TokenizerBatch
from protein_structure_tokenizer_tpu.models import fsq as fsq_lib
from protein_structure_tokenizer_tpu.models.attention import (
    cross_attention_scaler,
    cross_attention_scaler_init,
)
from protein_structure_tokenizer_tpu.models.config import Vq3dConfig
from protein_structure_tokenizer_tpu.models.gnn import (
    graph_neural_network,
    graph_neural_network_init,
)
from protein_structure_tokenizer_tpu.models.layers import linear, linear_init
from protein_structure_tokenizer_tpu.parallel import cp
from protein_structure_tokenizer_tpu.models.posenc import sinusoidal_features
from protein_structure_tokenizer_tpu.models.seq_decoder import (
    sequence_decoder,
    sequence_decoder_init,
)
from protein_structure_tokenizer_tpu.models.structure_module import (
    structure_module,
    structure_module_init,
)
from protein_structure_tokenizer_tpu.utils.params import (
    Params,
    merge,
    subtree,
    with_prefix,
)

SCOPE_ENCODER = "vq3_d/~/structure_encoder"
SCOPE_GNN = "vq3_d/~/structure_encoder/~/graph_neural_network/~"
SCOPE_DOWN = "vq3_d/~/cross_attn_downsampling"
SCOPE_UP = "vq3_d/~/cross_attn_upsampling"
SCOPE_DOWN_PROJ = "vq3_d/~encode/down_proj"
SCOPE_UP_PROJ = "vq3_d/~decode/up_proj"
SCOPE_SEQ_DECODER = "vq3_d/~/sequence_decoder"
SCOPE_STRUCTURE_MODULE = "vq3_d/~/structure_module"


def _spherical_normalize(x: jax.Array) -> jax.Array:
    return x / (jnp.linalg.norm(x, ord=2, axis=-1, keepdims=True) + 1e-6)


def _local_window_mask(seq_max: int, downsampling: int) -> jax.Array:
    """(T, N) mask: token t attends residues [t*df, t*df + df)."""
    t = seq_max // downsampling
    rows = jnp.arange(t)[:, None]
    cols = jnp.arange(seq_max)[None, :]
    return ((cols >= rows * downsampling) & (cols < (rows + 1) * downsampling)).astype(
        jnp.float32
    )


def structure_encoder(
    params: Params,
    cfg: Vq3dConfig,
    graph: ProteinGraphBatch,
    *,
    canonical_receivers: bool = True,
    exact_aggregation: bool = False,
    use_pallas: bool | None = None,
    use_onehot: bool | None = None,
    mesh=None,
):
    """Node/edge embeddings: purely positional node init, geometry via edges.

    ``mesh`` with a "ctx" axis (parallel/cp.py) row-shards the (B, N*K, ...)
    edge table over the mesh — context-parallel encode for long chains."""
    enc = cfg.encoder
    p = subtree(params, SCOPE_ENCODER)
    batch = graph.edge_features.shape[0]
    seq_max = cfg.data.seq_max_size
    # Runtime padded length may be a shorter LENGTH BUCKET (runner
    # length-bucketing): shapes follow n_pad, but every positional encoding
    # keeps seq_max as its base so valid rows are bit-identical to a
    # full-seq_max padding (the reference always pads to 512 — same base).
    n_pad = graph.nodes_mask.shape[1]
    pe_dim = enc.positional_encoding_dimension

    node_pe = sinusoidal_features(jnp.arange(n_pad), seq_max, pe_dim)
    node_feats = linear(p["init_node_embed"], node_pe)  # (N, D) — identical per sample
    node_feats = jnp.broadcast_to(node_feats[None], (batch,) + node_feats.shape)

    if use_onehot is None:
        use_onehot = jax.default_backend() == "tpu"
    fast = canonical_receivers and not exact_aggregation and use_onehot and n_pad <= 2048
    # The sender one-hot turns every row gather in the encoder into an MXU
    # matmul; built ONCE here and reused by the edge PE below and by every
    # GNN layer's message/edge-update gathers.
    sender_onehot = (
        jax.nn.one_hot(graph.senders, n_pad, dtype=jnp.bfloat16) if fast else None
    )
    if sender_onehot is not None:
        sender_onehot = cp.constrain(sender_onehot, mesh, cp.EDGE_SPEC)

    if fast:
        # Edge PE depends only on the integer index difference s - n, which
        # takes 2N-1 distinct values — instead of sin/cos over the full
        # (B, E, PE) edge table (profiled at ~5 ms/forward on the CASP14
        # batch: transcendentals + broadcast divides on 105M elements), build
        # the (2N-1, PE) table once, fold it through the PE half of the
        # init_edge_embed Linear, and select rows with the sender one-hot.
        # t2_shift[n, s] = t2[s - n + N - 1] makes the selection a plain
        # batched matmul over the existing one-hot (no new gather).
        w = p["init_edge_embed"]["w"]
        pe_table = sinusoidal_features(
            jnp.arange(-(n_pad - 1), n_pad), seq_max, pe_dim
        )  # (2N-1, PE)
        t2 = jnp.matmul(pe_table, w[:pe_dim], preferred_element_type=jnp.float32)
        shift_idx = (
            jnp.arange(n_pad)[None, :] - jnp.arange(n_pad)[:, None] + n_pad - 1
        )
        t2_shift = jnp.take(t2, shift_idx, axis=0)  # (N, N, D)
        geom_part = jnp.matmul(
            graph.edge_features, w[pe_dim:], preferred_element_type=jnp.float32
        )
        b = p["init_edge_embed"].get("b")
        if b is not None:
            geom_part = geom_part + b
        num_edges = graph.edge_features.shape[1]
        k_slots = num_edges // n_pad
        pe_part = jnp.einsum(
            "bnks,nsd->bnkd",
            sender_onehot.reshape(batch, n_pad, k_slots, n_pad),
            t2_shift,
            preferred_element_type=jnp.float32,
        ).reshape(batch, num_edges, -1)
        edge_feats = pe_part + geom_part
    else:
        edge_pe = sinusoidal_features(
            graph.senders - graph.receivers, seq_max, pe_dim
        )  # (B, E, PE)
        edge_feats = jnp.concatenate([edge_pe, graph.edge_features], axis=-1)
        edge_feats = linear(p["init_edge_embed"], edge_feats)
    edge_feats = cp.constrain(edge_feats, mesh, cp.EDGE_SPEC)

    return graph_neural_network(
        subtree(params, SCOPE_GNN),
        enc.gnn,
        node_feats,
        edge_feats,
        graph.senders,
        graph.receivers,
        graph.nodes_mask,
        canonical_receivers=canonical_receivers,
        exact=exact_aggregation,
        use_pallas=use_pallas,
        sender_onehot=sender_onehot,
        mesh=mesh,
    )


def _down_attention_mask(cfg: Vq3dConfig, nodes_mask, tokens_mask, exact: bool = False) -> jax.Array:
    """(B, 1|H, T, N) downsampler attention mask incl. the local-window rule.

    Fast mode keeps the head axis singleton — broadcasting in the attention
    bias is mathematically identical to the reference's explicit per-head
    repeat and saves num_head x (B, T, N) of HBM traffic; exact mode
    materializes the repeat so XLA fuses identically to the reference
    (bitwise activations).
    """
    base = tokens_mask * jnp.swapaxes(nodes_mask, -1, -2)  # (B, T, N)
    if exact:
        mask = jnp.repeat(base[:, None], cfg.down_sampler.cross_attn.num_head, axis=1)
    else:
        mask = base[:, None]  # (B, 1, T, N)
    if cfg.down_local_attn or cfg.down_causal_attn:
        # slice to the runtime padded node count (length buckets < seq_max)
        n_pad = nodes_mask.shape[-2]
        local = _local_window_mask(cfg.data.seq_max_size, cfg.data.downsampling_ratio)
        local = local[:, :n_pad][None, None]  # (1, 1, T, N)
        if cfg.down_local_attn:
            mask = local * mask
        else:  # causal: token t sees residues up to (t+1)*df
            mask = jnp.cumsum(local, axis=-2) * mask
    return mask


def _up_attention_mask(cfg: Vq3dConfig, nodes_mask, tokens_mask, exact: bool = False) -> jax.Array:
    """(B, 1|H, N, T) upsampler attention mask (head axis broadcasts in fast mode)."""
    base = tokens_mask * jnp.swapaxes(nodes_mask, -1, -2)  # (B, T, N)
    if exact:
        mask = jnp.repeat(base[:, None], cfg.up_sampler.cross_attn.num_head, axis=1)
        mask = jnp.swapaxes(mask, -1, -2)  # (B, H, N, T)
    else:
        mask = jnp.swapaxes(base[:, None], -1, -2)  # (B, 1, N, T)
    if cfg.up_local_attn:
        n_pad = nodes_mask.shape[-2]
        local = _local_window_mask(cfg.data.seq_max_size, cfg.data.downsampling_ratio)
        mask = mask * jnp.swapaxes(local[:, :n_pad], -1, -2)[None, None]
    return mask


def encode(
    params: Params,
    cfg: Vq3dConfig,
    graph: ProteinGraphBatch,
    *,
    canonical_receivers: bool = True,
    exact_aggregation: bool = False,
    use_pallas: bool | None = None,
    use_onehot: bool | None = None,
    mesh=None,
):
    """Graph -> (continuous embedding (B,T,D_codes), pre-projection (B,T,128))."""
    nodes_emb, _ = structure_encoder(
        params,
        cfg,
        graph,
        canonical_receivers=canonical_receivers,
        exact_aggregation=exact_aggregation,
        use_pallas=use_pallas,
        use_onehot=use_onehot,
        mesh=mesh,
    )

    attn_mask = _down_attention_mask(
        cfg, graph.nodes_mask, graph.tokens_mask, exact=exact_aggregation
    )
    # output/input masks are pass-throughs the scaler math never reads
    # (Transition ignores its mask; modules.py:211-262) — no need to repeat
    # them over channels as the reference does.
    out_mask = graph.tokens_mask

    continuous = cross_attention_scaler(
        subtree(params, SCOPE_DOWN),
        cfg.down_sampler,
        nodes_emb,
        attn_mask,
        out_mask,
        graph.nodes_mask,
    )

    if cfg.down_sampler_normalization == "spherical":
        pre_proj = _spherical_normalize(continuous)
    else:
        pre_proj = continuous

    if cfg.down_proj_dim is not None:
        projected = linear(params[SCOPE_DOWN_PROJ], pre_proj)
    else:
        projected = pre_proj
    return projected, pre_proj


def quantize_embedding(
    params: Params,
    cfg: Vq3dConfig,
    continuous_embedding: jax.Array,
    tokens_mask: jax.Array,
    *,
    is_training: bool = False,
    compute_usage: bool = True,
    compute_distances: bool = False,
    usage_reduce_axis: Optional[str] = None,
):
    del params  # FSQ has no learned parameters
    if cfg.fsq is None:
        out = {
            "quantize": continuous_embedding,
            "continuous_embedding": continuous_embedding,
            "straight_through_quantized": continuous_embedding,
            "tokens": continuous_embedding,
        }
        return continuous_embedding, out
    mask = jnp.repeat(tokens_mask, cfg.fsq.codes_dimension, axis=-1)
    out = fsq_lib.quantize(
        cfg.fsq,
        continuous_embedding,
        mask,
        compute_usage=compute_usage,
        compute_distances=compute_distances,
        usage_reduce_axis=usage_reduce_axis,
    )
    quantized = out["straight_through_quantized"] if is_training else out["quantize"]
    return quantized, out


def encode_and_quantize(
    params: Params,
    cfg: Vq3dConfig,
    graph: ProteinGraphBatch,
    *,
    is_training: bool = False,
    compute_usage: bool = True,
    compute_distances: bool = False,
    usage_reduce_axis: Optional[str] = None,
    canonical_receivers: bool = True,
    exact_aggregation: bool = False,
    use_pallas: bool | None = None,
    use_onehot: bool | None = None,
    mesh=None,
):
    continuous, pre_proj = encode(
        params,
        cfg,
        graph,
        mesh=mesh,
        canonical_receivers=canonical_receivers,
        exact_aggregation=exact_aggregation,
        use_pallas=use_pallas,
        use_onehot=use_onehot,
    )
    _, out = quantize_embedding(
        params,
        cfg,
        continuous,
        graph.tokens_mask,
        is_training=is_training,
        compute_usage=compute_usage,
        compute_distances=compute_distances,
        usage_reduce_axis=usage_reduce_axis,
    )
    out["continuous_embedding_pre_proj"] = pre_proj
    return out


def indexes_to_codes(cfg: Vq3dConfig, tokens: jax.Array) -> jax.Array:
    if cfg.fsq is None:
        raise ValueError("continuous ablation has no token codec")
    return fsq_lib.indexes_to_codes(cfg.fsq, tokens)


def decode(
    params: Params,
    cfg: Vq3dConfig,
    quantized: jax.Array,  # (B, T, D_codes)
    nodes_mask: jax.Array,  # (B, N, 1)
    tokens_mask: jax.Array,  # (B, T, 1)
    *,
    exact: bool = False,
    use_pallas: bool | None = None,
    mesh=None,
):
    """Codes -> (quantized_proj, single track s_i, pair track z_ij).

    ``mesh`` with a "ctx" axis (parallel/cp.py) row-shards the quadratic pair
    track over the mesh — context parallelism for long chains/pods."""
    if cfg.up_proj_dim is not None:
        quantized_proj = linear(params[SCOPE_UP_PROJ], quantized)
    else:
        quantized_proj = quantized

    attn_mask = _up_attention_mask(cfg, nodes_mask, tokens_mask, exact=exact)
    out_mask = nodes_mask

    # Length buckets (runner): the token track and nodes_mask may be padded
    # to a bucket shorter than the configured lengths — emit only that many
    # upsampler queries and keep both PE bases bound to the full lengths, so
    # valid rows are bit-identical to full padding.
    n_pad = nodes_mask.shape[1]
    seq_decoded = cross_attention_scaler(
        subtree(params, SCOPE_UP),
        cfg.up_sampler,
        quantized_proj,
        attn_mask,
        out_mask,
        tokens_mask,
        out_len=n_pad if n_pad != cfg.up_sampler.max_out_len else None,
        in_pos_base=cfg.down_sampler.max_out_len,
    )

    if cfg.up_sampler_normalization == "spherical":
        seq_decoded = _spherical_normalize(seq_decoded)

    s_i, z_ij = sequence_decoder(
        subtree(params, SCOPE_SEQ_DECODER), cfg.decoder, seq_decoded, nodes_mask,
        exact=exact, use_pallas=use_pallas, mesh=mesh,
    )
    return quantized_proj, s_i, z_ij


def _dummy_ala_features(batch: int, num_res: int) -> dict:
    """Backbone-only atom37 mask + dummy-ALA aatype for decode-only runs."""
    atom37_gt_exists = jnp.concatenate(
        [
            jnp.ones((batch, num_res, 3), jnp.int32),  # N, CA, C
            jnp.zeros((batch, num_res, 1), jnp.int32),  # CB
            jnp.ones((batch, num_res, 1), jnp.int32),  # O
            jnp.zeros((batch, num_res, 32), jnp.int32),
        ],
        axis=-1,
    )
    aatype = jnp.concatenate(
        [jnp.ones((batch, num_res, 1)), jnp.zeros((batch, num_res, 20))], axis=-1
    )
    return {"atom37_gt_exists": atom37_gt_exists, "aatype": aatype}


def decode_and_make_structure(
    params: Params,
    cfg: Vq3dConfig,
    quantized: jax.Array,
    nodes_mask: jax.Array,
    tokens_mask: jax.Array,
    *,
    exact_ipa: bool = False,
    use_pallas: bool | None = None,
    mesh=None,
) -> dict:
    _, s_i, z_ij = decode(
        params, cfg, quantized, nodes_mask, tokens_mask,
        exact=exact_ipa, use_pallas=use_pallas, mesh=mesh,
    )
    batch, num_res = s_i.shape[:2]
    features = _dummy_ala_features(batch, num_res)
    return structure_module(
        subtree(params, SCOPE_STRUCTURE_MODULE),
        cfg.structure_module,
        {"single": s_i, "pair": z_ij},
        features,
        nodes_mask,
        exact=exact_ipa,
        use_pallas=use_pallas,
        mesh=mesh,
    )


def forward(
    params: Params,
    cfg: Vq3dConfig,
    batch: TokenizerBatch,
    *,
    is_training: bool = False,
    compute_usage: bool = True,
    compute_distances: bool = False,
    usage_reduce_axis: Optional[str] = None,
    canonical_receivers: bool = True,
    exact_aggregation: bool = False,
    exact_ipa: bool = False,
    use_pallas: bool | None = None,
    mesh=None,
):
    """Full autoencoder pass -> (decoded_structure, quantizer_output).

    ``use_pallas`` defaults to OFF when ``is_training`` (the fused GNN kernels
    have no VJP yet, and training must differentiate the encoder); inference
    callers inherit the backend default.
    """
    graph = batch.graph
    if use_pallas is None and is_training:
        use_pallas = False
    continuous, pre_proj = encode(
        params,
        cfg,
        graph,
        canonical_receivers=canonical_receivers,
        exact_aggregation=exact_aggregation,
        use_pallas=use_pallas,
        mesh=mesh,
    )
    quantized, out = quantize_embedding(
        params,
        cfg,
        continuous,
        graph.tokens_mask,
        is_training=is_training,
        compute_usage=compute_usage,
        compute_distances=compute_distances,
        usage_reduce_axis=usage_reduce_axis,
    )
    out["continuous_embedding_pre_proj"] = pre_proj

    quantized_proj, s_i, z_ij = decode(
        params, cfg, quantized, graph.nodes_mask, graph.tokens_mask,
        exact=exact_ipa, use_pallas=use_pallas, mesh=mesh,
    )
    out["quantize_post_proj"] = quantized_proj

    decoded = structure_module(
        subtree(params, SCOPE_STRUCTURE_MODULE),
        cfg.structure_module,
        {"single": s_i, "pair": z_ij},
        batch.features,
        graph.nodes_mask,
        exact=exact_ipa,
        use_pallas=use_pallas,
        mesh=mesh,
    )
    return decoded, out


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init(key, cfg: Vq3dConfig) -> Params:
    ks = jax.random.split(key, 8)
    enc = cfg.encoder
    pe_dim = enc.positional_encoding_dimension

    encoder_params = {
        "init_node_embed": linear_init(ks[0], pe_dim, enc.encoding_dimension),
        "init_edge_embed": linear_init(ks[1], pe_dim + 27, enc.encoding_dimension),
    }
    params = with_prefix(encoder_params, SCOPE_ENCODER)
    params = merge(
        params,
        with_prefix(graph_neural_network_init(ks[2], enc.gnn), SCOPE_GNN),
        with_prefix(
            cross_attention_scaler_init(ks[3], cfg.down_sampler, enc.encoding_dimension),
            SCOPE_DOWN,
        ),
        with_prefix(
            cross_attention_scaler_init(
                ks[4],
                cfg.up_sampler,
                cfg.codes_dimension if cfg.up_proj_dim is None else cfg.up_proj_dim,
            ),
            SCOPE_UP,
        ),
        with_prefix(
            sequence_decoder_init(ks[5], cfg.decoder, cfg.up_sampler.out_emb_size),
            SCOPE_SEQ_DECODER,
        ),
        with_prefix(
            structure_module_init(ks[6], cfg.structure_module), SCOPE_STRUCTURE_MODULE
        ),
    )
    if cfg.down_proj_dim is not None:
        params[SCOPE_DOWN_PROJ] = linear_init(
            ks[7], cfg.down_sampler.out_emb_size, cfg.down_proj_dim
        )
    if cfg.up_proj_dim is not None:
        params[SCOPE_UP_PROJ] = linear_init(
            jax.random.fold_in(ks[7], 1), cfg.codes_dimension, cfg.up_proj_dim
        )
    return params
