"""Context (sequence) parallelism for the decoder's quadratic pair track.

The reference caps proteins at 512 residues and keeps every (N, N) tensor on
one device (/root/reference/scripts/inference_runner.py:52-56; SURVEY.md
§5.7).  The decode path is quadratic in N — the pair representation
(B, N, N, 128) and the 8-iteration IPA logits (B, h, N, N) — so its memory
wall is the pair tensor, not parameters.  This module shards that wall over
the mesh: a ``Mesh(("data", "ctx"))`` where the pair track's QUERY-ROW axis
(dim 1 of (B, N_i, N_j, C), dim 2 of (B, h, i, j) logits) is split over
"ctx".

Design (GSPMD, not hand-written collectives — the scaling-book recipe):
  * every row-block computation is local: the outer-product pair init, the
    relpos PE add, pair transition/LN, the IPA pair bias, the softmax (keys
    axis j stays unsharded, so each row's softmax is complete on its chip),
    and the attention-over-pair contraction ``bhij,bijc->bihc``;
  * the single track is small (B, N, 384) — after attention its rows are
    ctx-sharded, and XLA inserts one all-gather of the (B, h, N, ~30)
    key/value tensors per fold iteration, megabytes against the pair
    track's gigabytes;
  * we only *annotate* the pair tensors with ``with_sharding_constraint``;
    XLA partitions every op touching them and places the collectives.

Net effect: per-chip pair memory and pair-track FLOPs scale 1/ctx, lifting
the single-chip N ceiling (a 2048-residue decode at B=1 is a 2 GB pair
tensor — 256 MB/chip on a ctx=8 slice) and cutting decode latency on pods.
Token outputs are unchanged (verified 1-device vs ctx-mesh in
tests/test_cp.py).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib

DATA_AXIS = "data"
CTX_AXIS = "ctx"

# Specs for the two quadratic decode layouts.
PAIR_SPEC = P(DATA_AXIS, CTX_AXIS, None, None)  # (B, N_i, N_j, C)
LOGITS_SPEC = P(DATA_AXIS, None, CTX_AXIS, None)  # (B, h, i, j)
# Encoder edge-table layouts: the E = N*K axis shards in receiver-row blocks
# (row-major by receiver, so ctx | N keeps shard boundaries on row edges).
EDGE_SPEC = P(DATA_AXIS, CTX_AXIS, None)  # (B, E, D) / (B, E, N) one-hot
EDGE4_SPEC = P(DATA_AXIS, CTX_AXIS, None, None)  # (B, N, K, D)


def make_ctx_mesh(
    n_ctx: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Mesh(("data", "ctx")): trailing (ICI-adjacent) axis for the row shards."""
    return mesh_lib.make_hybrid_mesh(CTX_AXIS, n_ctx, devices)


def has_ctx_axis(mesh: Optional[Mesh]) -> bool:
    return mesh_lib.has_axis(mesh, CTX_AXIS)


def constrain(x: jax.Array, mesh: Optional[Mesh], spec: P) -> jax.Array:
    """Sharding hint that degrades to a no-op without a >1 ctx axis."""
    return mesh_lib.constrain(x, mesh, spec, CTX_AXIS)
