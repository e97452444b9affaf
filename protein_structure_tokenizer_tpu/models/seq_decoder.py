"""Pairwise representation + sequence decoder (single track -> pair track).

Parity with /root/reference/structure_tokenizer/model/modules.py:639-740
(PairwiseRepresentation) and sequence_decoder.py:27-112, written natively
batched: the all-pairs relative positional encoding is computed once as an
(N, N, D) broadcast instead of vmapping a scalar PE over N^2 index pairs,
and the outer product runs as a single einsum that XLA maps onto the MXU.
"""
from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.utils.log import warn_once

from protein_structure_tokenizer_tpu.models.attention import (
    TransitionConfig,
    transition,
    transition_init,
)
from protein_structure_tokenizer_tpu.models.layers import (
    af2_linear,
    af2_linear_init_leaves,
    layer_norm,
    layer_norm_1pass,
    linear,
    linear_init,
    norm_init,
)
from protein_structure_tokenizer_tpu.models.posenc import sinusoidal_features
from protein_structure_tokenizer_tpu.parallel import cp
from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
from protein_structure_tokenizer_tpu.utils.params import Params, subtree, with_prefix

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class PairRepConfig:
    num_intermediate_factor: int = 2
    output_dim: int = 128
    lnormalisation: bool = True


@dataclasses.dataclass(frozen=True)
class SeqDecoderConfig:
    positional_encoding_dimension: int = 128
    seq_max_size: int = 512
    pair_representation: PairRepConfig = PairRepConfig()
    pair_transition: TransitionConfig = TransitionConfig()


def pairwise_representation(
    p: Params, cfg: PairRepConfig, x: jax.Array, mask: jax.Array,
    *, one_pass_ln: bool = False, mesh=None,
) -> jax.Array:
    """Outer-product pair init (AF2 alg.10 flavor).

    x: (B, N, C); mask: (B, N, 1) row validity. Returns (B, N, N, output_dim).
    ``one_pass_ln`` uses single-read LN statistics on the (B, N, N, C) output
    (fast path; the exact path keeps the reference's two-pass form).
    ``mesh`` with a "ctx" axis row-shards the pair tensor (parallel/cp.py).
    """
    x = layer_norm(p["layer_norm_input"], x)
    left = mask * af2_linear(p["left_projection"], x)
    right = mask * af2_linear(p["right_projection"], x)
    outer = jnp.einsum("...nd,...kd->...nkd", left, right)
    outer = cp.constrain(outer, mesh, cp.PAIR_SPEC)

    pair = af2_linear(p["output_projection_layer1"], outer)
    pair = jax.nn.relu(pair)
    pair = af2_linear(p["output_projection_layer2"], pair)

    residual = af2_linear(p["right_projection_1"], outer)
    if cfg.lnormalisation:
        ln = layer_norm_1pass if one_pass_ln else layer_norm
        return ln(p["layer_norm_output"], pair + residual)
    return pair + residual


def pairwise_representation_init(key, cfg: PairRepConfig, in_dim: int) -> Params:
    inter = cfg.num_intermediate_factor * in_dim
    inter_out = cfg.num_intermediate_factor * cfg.output_dim
    ks = jax.random.split(key, 5)
    return {
        "layer_norm_input": norm_init(in_dim),
        "left_projection": af2_linear_init_leaves(ks[0], (in_dim,), (inter,)),
        "right_projection": af2_linear_init_leaves(ks[1], (in_dim,), (inter,)),
        "output_projection_layer1": af2_linear_init_leaves(
            ks[2], (inter,), (inter_out,), initializer="relu"
        ),
        "output_projection_layer2": af2_linear_init_leaves(ks[3], (inter_out,), (cfg.output_dim,)),
        "right_projection_1": af2_linear_init_leaves(ks[4], (inter,), (cfg.output_dim,)),
        "layer_norm_output": norm_init(cfg.output_dim),
    }


def _fused_pair_path(
    params: Params, cfg: SeqDecoderConfig, single_emb: jax.Array, nodes_mask: jax.Array,
    *, bf16_operands: bool = True,
) -> jax.Array:
    """Pair track via the fused Pallas kernel (ops/pair_kernels.py): the only
    HBM traffic is the projection tracks in and the final pair tensor out."""
    from protein_structure_tokenizer_tpu.ops.pair_kernels import (
        fused_pair_representation,
    )

    pr = subtree(params, "pairwise_representation")
    x = layer_norm(pr["layer_norm_input"], single_emb)
    left = nodes_mask * af2_linear(pr["left_projection"], x)
    right = nodes_mask * af2_linear(pr["right_projection"], x)

    d = cfg.positional_encoding_dimension
    tr = subtree(params, "pair_transition_init")
    weights = {
        "w1": pr["output_projection_layer1"]["weights"],
        "b1": pr["output_projection_layer1"]["bias"],
        "w2": pr["output_projection_layer2"]["weights"],
        "b2": pr["output_projection_layer2"]["bias"],
        "wr": pr["right_projection_1"]["weights"],
        "br": pr["right_projection_1"]["bias"],
        "ln1_scale": pr["layer_norm_output"]["scale"],
        "ln1_offset": pr["layer_norm_output"]["offset"],
        "wl_rel": params["linear"]["w"][:d],
        "wl_pair": params["linear"]["w"][d:],
        "bl": params["linear"]["b"],
        "ln2_scale": tr["input_layer_norm"]["scale"],
        "ln2_offset": tr["input_layer_norm"]["offset"],
        "t1": tr["transition1"]["weights"],
        "tb1": tr["transition1"]["bias"],
        "t2": tr["transition2"]["weights"],
        "tb2": tr["transition2"]["bias"],
    }
    return fused_pair_representation(
        left, right, weights, seq_max=cfg.seq_max_size, pe_dim=d,
        bf16_operands=bf16_operands,
    )


def _fused_pair_applicable(params: Params, cfg: SeqDecoderConfig, n: int) -> bool:
    from protein_structure_tokenizer_tpu.ops.pair_kernels import (
        pair_representation_supported,
    )

    return (
        cfg.pair_representation.lnormalisation
        and cfg.pair_transition.chunk_size is None
        and "b" in params["linear"]
        and pair_representation_supported(n)
    )


def sequence_decoder(
    params: Params,
    cfg: SeqDecoderConfig,
    single_emb: jax.Array,  # (B, N, C)
    nodes_mask: jax.Array,  # (B, N, 1)
    *,
    exact: bool = False,
    use_pallas: bool | None = None,
    mesh=None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (s_i, z_ij): the single track unchanged and the pair track.

    ``exact=True`` reproduces the reference's op order bit-for-bit
    (concat the dense relative PE onto the pair track, then one Linear over
    256 dims, broadcast over batch).  The default path is algebraically equal
    but splits the concat-matmul — ``[relpos; pair] @ W = relpos @ W_r +
    pair @ W_p`` — so the relative-PE half (a function of index difference
    only) is computed ONCE without a batch axis and broadcast-added: the
    (B, N, N, 2D) concat intermediate never hits HBM and the PE half of the
    contraction isn't redone B times.
    """
    batch, n, _ = single_emb.shape

    # Fused Pallas pair kernel: OPT-IN (use_pallas=True).  End-to-end v5e
    # decode A/B at B=32 (round 3, honest fetch barriers, warm compiles):
    # the kernel loses ~10% at N=512 (211-233 vs 190-213 ms), ties within
    # run-to-run noise at N=128-384.  XLA's schedule for the pair chain is
    # already HBM-roofline-bound with operands fed bf16 (DEFAULT matmul
    # precision), so the fusion has no traffic left to remove at the
    # flagship shape.  use_pallas="exact_dots" keeps full-f32 products
    # (tight-equivalence tests); the ``exact`` conformance path bypasses the
    # kernel entirely.
    if use_pallas is None:
        use_pallas = False
    if use_pallas and not mesh_lib.single_device(mesh):
        warn_once(
            logger,
            "pair_pallas_mesh_gate",
            "use_pallas requested but the mesh spans %d devices; the fused "
            "pair kernel needs arrays whole on one device — falling back to "
            "the XLA pair path (wrap with parallel.mesh.data_shard_map to "
            "keep kernels active under data parallelism)",
            mesh.size,
        )
    if (
        use_pallas
        and not exact
        and mesh_lib.single_device(mesh)  # pallas_call: no GSPMD partitioning
        and _fused_pair_applicable(params, cfg, n)
    ):
        return single_emb, _fused_pair_path(
            params, cfg, single_emb, nodes_mask,
            bf16_operands=use_pallas != "exact_dots",
        )

    pair = pairwise_representation(
        subtree(params, "pairwise_representation"),
        cfg.pair_representation,
        single_emb,
        nodes_mask,
        one_pass_ln=not exact,
        mesh=mesh,
    )

    # Dense all-pairs relative PE over index differences sender - receiver.
    # The reference flattens senders=[0..N-1]*N, receivers=[0]*N,[1]*N,... and
    # reshapes row-major, so entry (r, c) encodes difference c - r
    # (model.py:519-523 + sequence_decoder.py:73-98).
    d = cfg.positional_encoding_dimension
    diff = jnp.arange(n)[None, :] - jnp.arange(n)[:, None]
    relpos = sinusoidal_features(diff, cfg.seq_max_size, d)  # (N, N, D)

    w = params["linear"]["w"]  # (D + pair_dim, D_out)
    b = params["linear"].get("b")
    if exact:
        relpos_b = jnp.broadcast_to(relpos[None], (batch, n, n, d))
        pair = jnp.concatenate([relpos_b, pair], axis=-1)
        pair = linear(params["linear"], pair)
    else:
        relpos_term = relpos.astype(pair.dtype) @ w[:d].astype(pair.dtype)  # (N, N, D_out)
        if b is not None:
            relpos_term = relpos_term + b
        pair = pair @ w[d:].astype(pair.dtype) + relpos_term[None]
    pair = cp.constrain(pair, mesh, cp.PAIR_SPEC)
    pair = transition(
        subtree(params, "pair_transition_init"), cfg.pair_transition, pair,
        one_pass_ln=not exact,
    )
    pair = cp.constrain(pair, mesh, cp.PAIR_SPEC)
    return single_emb, pair


def sequence_decoder_init(key, cfg: SeqDecoderConfig, in_dim: int) -> Params:
    k0, k1, k2 = jax.random.split(key, 3)
    d = cfg.positional_encoding_dimension
    return {
        **with_prefix(
            pairwise_representation_init(k0, cfg.pair_representation, in_dim),
            "pairwise_representation",
        ),
        "linear": linear_init(k1, d + cfg.pair_representation.output_dim, d),
        **with_prefix(
            transition_init(k2, cfg.pair_transition, d), "pair_transition_init"
        ),
    }
