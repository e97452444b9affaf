"""Expert parallelism for the MoE GPT (GSPMD over an "expert" mesh axis).

The reference has no MoE (its LM is dense, /root/reference/scripts/lm/
gpt_layer.py:529-565); this axis exists for scaling NEW token LMs trained in
this framework (lm/moe.py).  Layout:

  * stacked expert weights (E, M, F) / (E, F, M) shard their leading axis
    over "expert" — each chip owns E/ep experts' parameters and optimizer
    state (the memory win of MoE);
  * the dispatched token buffers (E, B, C, M) shard the same way, so the
    expert matmuls are fully local; GSPMD inserts the all-to-alls on the
    dense dispatch/combine einsums (tokens travel to their experts' chips
    and back over ICI);
  * everything else (attention, router, norms, embeddings) is data-parallel
    and replicated, exactly as the 1-D mesh path.

Composition with the other axes is deliberate: EP is its own 2-D
Mesh(("data", "expert")) — the tokenizer and dense-GPT paths keep their own
tp/pp/cp meshes (parallel/{tp,pp,cp}.py).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib

DATA_AXIS = "data"
EXPERT_AXIS = "expert"

# Dispatched token buffers (E, B, C, M) and expert hiddens (E, B, C, F):
# expert-major axis sharded, batch stays on "data".
TOKENS_SPEC = P(EXPERT_AXIS, DATA_AXIS, None, None)
HIDDEN_SPEC = P(EXPERT_AXIS, DATA_AXIS, None, None)


def make_ep_mesh(
    n_expert: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Mesh(("data", "expert")): trailing (ICI-adjacent) axis carries the
    expert split so the dispatch all-to-alls ride neighbor links."""
    return mesh_lib.make_hybrid_mesh(EXPERT_AXIS, n_expert, devices)


def has_expert_axis(mesh: Optional[Mesh]) -> bool:
    return mesh_lib.has_axis(mesh, EXPERT_AXIS)


def constrain(x: jax.Array, mesh: Optional[Mesh], spec: P) -> jax.Array:
    """Sharding hint that degrades to a no-op without a >1 expert axis."""
    return mesh_lib.constrain(x, mesh, spec, EXPERT_AXIS)


def moe_param_spec(scope: str, leaf: str, ndim: int) -> P:
    """PartitionSpec for one GPT param leaf under expert parallelism:
    stacked expert weights shard on the expert axis, all else replicated."""
    if "/moe" in scope and leaf in ("w_gate", "w_value", "w1", "w2") and ndim == 3:
        return P(EXPERT_AXIS, None, None)
    return P()


def shard_moe_params(params: dict, mesh: Mesh) -> dict:
    """device_put every leaf of the flat {scope: {leaf: array}} tree with its
    expert-parallel sharding."""
    out = {}
    for scope, leaves in params.items():
        placed = {}
        for name, arr in leaves.items():
            spec = moe_param_spec(scope, name, getattr(arr, "ndim", 0))
            placed[name] = jax.device_put(arr, NamedSharding(mesh, spec))
        out[scope] = placed
    return out
