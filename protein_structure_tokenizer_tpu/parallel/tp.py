"""Tensor parallelism for the GPT LM (Megatron-style, jit/GSPMD).

The tokenizer itself is small (128-dim trunk) and data parallelism is the
right strategy for it (SURVEY.md §5.8); the GPT (20 layers x 1024 dim over
structure tokens) is the one model in the stack big enough for model-axis
sharding to pay off in serving latency and per-chip memory.  This module
implements the classic 2-way split per transformer block over a 2-D
``Mesh(("data", "model"))``:

  * qkv projections column-sharded (heads split over "model"),
  * attention output projection row-sharded (contraction over the sharded
    head axis -> GSPMD inserts ONE psum per block),
  * FFN fc1 column-sharded / fc2 row-sharded (second psum),
  * embeddings, norms and the LM head replicated (vocab is only ~4k).

No hand-written collectives: parameters are *placed* with these shardings and
the forward adds ``with_sharding_constraint`` hints on the two activations
whose layout GSPMD cannot infer locally (post-qkv heads, post-fc1 hidden);
XLA partitions every matmul and inserts the psums on the row-sharded
projections, riding ICI on real hardware.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Megatron sequence parallelism: between blocks the residual stream
# (B, T, E) is sharded along T over the SAME "model" axis the matmuls split
# over — the LN/residual segments run on T-shards, and GSPMD lowers each
# block's two psums into reduce-scatter + all-gather pairs (same bytes over
# ICI, 1/model_size of the activation memory and LN/residual flops per chip).
SP_SPEC = P(DATA_AXIS, MODEL_AXIS, None)


def make_2d_mesh(
    n_model: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Mesh(("data", "model")): trailing (ICI-adjacent) axis carries the
    model split."""
    return mesh_lib.make_hybrid_mesh(MODEL_AXIS, n_model, devices)


def has_model_axis(mesh: Optional[Mesh]) -> bool:
    return mesh_lib.has_axis(mesh, MODEL_AXIS)


def constrain(x: jax.Array, mesh: Optional[Mesh], spec: P) -> jax.Array:
    """Sharding hint that degrades to a no-op without a >1 model axis."""
    return mesh_lib.constrain(x, mesh, spec, MODEL_AXIS)


def gpt_param_spec(path: str) -> P:
    """PartitionSpec for one GPT param leaf, keyed by its scope path.

    Column-parallel: qkv ``w`` (E, E) and fc1 ``w`` (E, F') split on the
    output dim; row-parallel: out_linear (E, E) and fc2 (F, E) split on the
    input dim.  Everything else replicated.
    """
    if "self_attn" in path and any(
        k in path for k in ("query_linear", "key_linear", "value_linear")
    ):
        return P(None, MODEL_AXIS)
    if "self_attn" in path and "out_linear" in path:
        return P(MODEL_AXIS, None)
    if "fc1_linear" in path:  # fc1_linear or fc1_linear_glu
        return P(None, MODEL_AXIS)
    if "fc2_linear" in path:
        return P(MODEL_AXIS, None)
    return P()


def unshard_gpt_params(params: dict) -> dict:
    """Host-side inverse of :func:`shard_gpt_params` for checkpoint export:
    gathers every leaf and re-fuses the split GLU halves into the canonical
    (E, 2F) ``w`` leaf the plain forward / joblib format expects."""
    out = {}
    for scope, leaves in params.items():
        if "w_gate" in leaves:
            rest = {k: np.asarray(v) for k, v in leaves.items()
                    if k not in ("w_gate", "w_value")}
            out[scope] = {
                "w": np.concatenate(
                    [np.asarray(leaves["w_gate"]), np.asarray(leaves["w_value"])],
                    axis=1,
                ),
                **rest,
            }
        else:
            out[scope] = {k: np.asarray(v) for k, v in leaves.items()}
    return out


def shard_gpt_params(params: dict, mesh: Mesh) -> dict:
    """device_put every leaf with its tensor-parallel sharding.

    ``params`` is the flat ``{scope: {leaf: array}}`` tree used throughout
    ``lm/gpt.py``.  The fused GLU weight (E, 2F) is split into two
    column-sharded leaves ``w_gate``/``w_value`` — the *global* halves of the
    fused matrix would each span only half the "model" axis, forcing a
    reshard before the elementwise gate product (``lm/gpt.py`` consumes the
    split leaves when present).  Biases of column-parallel layers shard with
    their weight's output dim; row-parallel biases stay replicated (added
    after the psum).
    """
    out = {}
    for scope, leaves in params.items():
        spec = gpt_param_spec(scope)
        placed = {}
        for name, arr in leaves.items():
            if "fc1_linear_glu" in scope and name == "w":
                half = arr.shape[1] // 2
                sh = NamedSharding(mesh, P(None, MODEL_AXIS))
                placed["w_gate"] = jax.device_put(arr[:, :half], sh)
                placed["w_value"] = jax.device_put(arr[:, half:], sh)
                continue
            leaf_spec = spec
            if name == "b":
                if spec == P(MODEL_AXIS, None):
                    leaf_spec = P()  # row-parallel bias is added after the psum
                elif spec == P(None, MODEL_AXIS):
                    leaf_spec = P(MODEL_AXIS)
                else:
                    leaf_spec = P()
            elif arr.ndim != 2:
                leaf_spec = P()
            placed[name] = jax.device_put(arr, NamedSharding(mesh, leaf_spec))
        out[scope] = placed
    return out
