"""Analytic FLOP / HBM-byte models for the bench workloads.

Motivation (round-3 finding): ``compiled.cost_analysis()`` cannot see FLOPs
performed inside Pallas kernels, so an XLA-counted "MFU" silently changes
meaning whenever a kernel toggles (the recorded 2.16% was an undercount
artifact).  The numbers here are derived from the *mathematical model* —
matmul shapes traced from the canonical dense (no-Pallas) computation, byte
formulas written from the dominant tensors — so they are identical no matter
which code path executed, and an achieved-TFLOP/s or %-of-roofline line is
comparable across rounds and kernel configurations.

FLOPs: :func:`count_matmul_flops` walks the jaxpr of a function (recursing
through pjit/scan/cond/remat) and sums ``2 * M * N * K`` for every
``dot_general``.  Elementwise/reduction FLOPs are excluded — on TPU they are
VPU work, not MXU work, and are traffic-bound anyway; the MXU-roofline
denominator (``PEAK_BF16_FLOPS``) is a matmul peak, so the ratio stays
apples-to-apples.

Bytes: per-workload closed-form LOWER BOUNDS on HBM traffic (perfect fusion
assumed; every %-of-HBM-roofline line computed from these understates the
true achieved fraction).  Formulas documented inline per workload.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# TPU v5e (v5 lite) single-chip peaks.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_GBS = 819.0


# ---------------------------------------------------------------------------
# FLOP counting from the jaxpr
# ---------------------------------------------------------------------------


def _dot_general_flops(eqn) -> float:
    (lhs_c, rhs_c), (lhs_b, rhs_b) = eqn.params["dimension_numbers"]
    lhs, rhs = (v.aval for v in eqn.invars[:2])
    batch = math.prod(lhs.shape[d] for d in lhs_b)
    contract = math.prod(lhs.shape[d] for d in lhs_c)
    m = math.prod(
        s for d, s in enumerate(lhs.shape) if d not in set(lhs_c) | set(lhs_b)
    )
    n = math.prod(
        s for d, s in enumerate(rhs.shape) if d not in set(rhs_c) | set(rhs_b)
    )
    return 2.0 * batch * m * n * contract


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    # FLOPs = 2 * output elements * (kernel spatial x input features)
    dn = eqn.params["dimension_numbers"]
    k_spatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    in_feat = rhs.shape[dn.rhs_spec[1]]
    return 2.0 * math.prod(out.shape) * k_spatial * in_feat


def _jaxpr_flops(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            total += _dot_general_flops(eqn)
        elif prim == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif prim == "scan":
            total += eqn.params["length"] * _jaxpr_flops(eqn.params["jaxpr"].jaxpr)
        elif prim == "while":
            # No static trip count; count one iteration of each body so the
            # caller can at least see the per-step cost (benched loops use
            # scan, which has a length).
            total += _jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif prim == "cond":
            total += max(
                _jaxpr_flops(br.jaxpr) for br in eqn.params["branches"]
            )
        elif prim == "pallas_call":
            # Kernels are alternative SCHEDULES of the same math; the bench
            # counts FLOPs on the dense path, but recurse anyway (grid times
            # the kernel body) so counting a kernel-on trace is not silently
            # zero for the hot op.
            grid = eqn.params.get("grid_mapping")
            n_blocks = math.prod(grid.grid) if grid is not None else 1
            total += n_blocks * _jaxpr_flops(eqn.params["jaxpr"])
        else:
            # Generic recursion: pjit / closed_call / custom_jvp / remat etc.
            for name in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                inner = eqn.params.get(name)
                if inner is not None:
                    total += _jaxpr_flops(
                        inner.jaxpr if hasattr(inner, "jaxpr") else inner
                    )
                    break
    return total


def count_matmul_flops(fn, *args, **kwargs) -> float:
    """Total matmul FLOPs of ``fn(*args, **kwargs)``, from its jaxpr.

    Host-side tracing only — nothing is compiled or executed on a device.
    """
    jaxpr = jax.make_jaxpr(partial(fn, **kwargs))(*args)
    return _jaxpr_flops(jaxpr.jaxpr)


# ---------------------------------------------------------------------------
# Byte models (documented lower bounds)
# ---------------------------------------------------------------------------


def tree_float_bytes(tree) -> int:
    """Bytes of all floating-point AND int8 leaves (the per-step parameter
    read — int8 covers lm.quant's weight-only layout, whose int8 weights
    cross HBM every step just like float weights)."""
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(tree)
        if hasattr(leaf, "dtype")
        and (jnp.issubdtype(leaf.dtype, jnp.floating) or leaf.dtype == jnp.int8)
    )


def generate_block_bytes(
    params, cfg, batch: int, block: int, segment: int | None = None,
    int8_kv: bool = False,
) -> float:
    """HBM bytes for one ``block``-step KV-cached sampling pass (lower bound).

    Every step must read (a) the full parameter tree once — all layers +
    embed + head touch every weight for a (B, 1, C) activation — and (b) the
    live KV cache: 2 tensors x num_layers x (B, kv_len, C) in the cache
    dtype.  With ``segment=S`` (sampling.generate's growing-cache mode)
    step t's kv_len is ceil((t+1)/S)*S instead of always ``block``.  Writes
    (one (B, 1, C) cache row per layer) and activations are O(B x C) —
    negligible.  Reference workload:
    /root/reference/scripts/lm/generation_utils.py:26-58 (which instead
    re-reads the whole (B, block, C) activation stack per step).
    """
    param_bytes = tree_float_bytes(params)
    embed = params.get("gpt_decoder/~/token_embed") if hasattr(params, "get") else None
    if embed is not None:
        cache_dtype = embed["embeddings"].dtype
    else:
        cache_dtype = next(
            leaf.dtype
            for leaf in jax.tree_util.tree_leaves(params)
            if jnp.issubdtype(leaf.dtype, jnp.floating)
        )
    if segment:
        kv_total = sum(
            min(-(-(t + 1) // segment) * segment, block) for t in range(block)
        )
    else:
        kv_total = block * block
    if int8_kv:
        # int8 elements + one f32 scale per (batch, position, head) vector
        elem_bytes = 1.0 + 4.0 / cfg.key_size
    else:
        elem_bytes = jnp.dtype(cache_dtype).itemsize
    cache_bytes = (
        2 * cfg.num_layers * batch * kv_total * cfg.embed_dim * elem_bytes
    )
    return float(param_bytes * block + cache_bytes)


def decode_pair_bytes(
    batch: int, n_nodes: int, pair_dim: int = 128, itemsize: int = 4,
    num_fold_iterations: int = 8,
) -> float:
    """HBM bytes per decode batch (lower bound): the (B, N, N, pair_dim)
    pair track dominates everything else by ~N/128x.

    Minimum materializations of the pair tensor, from the model structure
    (models/seq_decoder.py + models/structure_module.py, mirroring
    /root/reference/structure_tokenizer/model/folding.py:36-288):

      pair build   — outer-product sum + relpos add, 1 write
      pair MLP     — 2 matmuls over the pair feature axis: read+write each
      transition   — LN read + 2 matmuls: 3 reads + 2 writes (inter dim = c)
      fold loop    — the IPA attention bias/logits term reads the pair
                     tensor once per iteration (bf16 copy: x0.5)

    Total f32-equivalent passes ~= 1 + 4 + 5 + iterations/2, each moving
    B x N^2 x pair_dim x itemsize bytes.  All O(B N c) single-track traffic
    is excluded (<2% at N=512).
    """
    passes = 1 + 4 + 5 + num_fold_iterations / 2
    return float(passes * batch * n_nodes * n_nodes * pair_dim * itemsize)


def tokenize_edge_bytes(
    batch: int, n_nodes: int, k: int = 50, hidden: int = 128, itemsize: int = 4,
    num_layers: int = 3,
) -> float:
    """HBM bytes per tokenize batch (lower bound): the (B, N, K, hidden) edge
    table dominates (K=50 neighbors per node; node/single tensors are K x
    smaller).  Each MPNN layer must read the edge table (message inputs) and
    write it back (edge update) at least once — perfect fusion folds the
    sender/receiver projections and LNs into those passes.  The final layer
    feeds the aggregation read.  Model: models/gnn.py, mirroring
    /root/reference/structure_tokenizer/model/gnn_layers.py.
    """
    edge = batch * n_nodes * k * hidden * itemsize
    return float((2 * num_layers + 1) * edge)
