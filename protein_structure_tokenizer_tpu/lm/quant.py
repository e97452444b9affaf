"""Weight-only int8 quantization for GPT sampling (serving opt-in).

KV-cached generation is HBM-bandwidth-bound: every step re-reads ALL
transformer weights plus the live KV cache (docs/PERFORMANCE.md).  Storing
the per-layer matmul weights as int8 (+ one f32 scale per output column)
halves the parameter term vs bf16: the weights cross HBM as int8 bytes and
XLA fuses the int8->bf16 convert into the matmul operand read, so no
dequantized copy is ever materialized.  Scales multiply the matmul OUTPUT
(per output column — symmetric per-channel quantization), which is exactly
equivalent to multiplying the weight columns up front; int8 integer values
are exactly representable in bf16, so accuracy is that of a bf16 matmul
over the rounded weights.

Only the big per-layer projections are quantized (qkv/out/FFN): embeddings,
norms and the LM head stay in the floating dtype — the head feeds the f32
logits island directly and the two tables are a rounding-error share of the
per-step bytes.  Distribution equivalence vs the f32 engine is pinned in
tests/test_gpt.py (logits KL + decisive-token agreement).

The reference has no quantized path (its sampling recipe is full-block f32
re-forward, /root/reference/scripts/lm/generation_utils.py:26-58); this is a
framework extension for production serving.
"""
from __future__ import annotations

import jax.numpy as jnp

from protein_structure_tokenizer_tpu.utils.params import Params

# Scope suffixes of the leaves worth quantizing: the per-layer matmuls that
# dominate the parameter read (the fused qkv leaf when fuse_qkv_params ran,
# the separate q/k/v otherwise).
_QUANT_SUFFIXES = (
    "/self_attn/~/qkv_linear",
    "/self_attn/~/query_linear",
    "/self_attn/~/key_linear",
    "/self_attn/~/value_linear",
    "/self_attn/~/out_linear",
    "/fc1_linear_glu",
    "/fc1_linear",
    "/fc2_linear",
)


def quantize_gpt_params_int8(params: Params) -> Params:
    """Symmetric per-output-channel int8 weights for the GPT matmul leaves.

    Each selected ``{"w": (in, out)}`` leaf becomes
    ``{"w_int8": int8 (in, out), "w_scale": f32 (out,)}``; every other leaf
    (embeddings, norms, LM head, biases) passes through unchanged.
    ``models.layers.linear`` consumes both layouts transparently.
    """
    out: Params = {}
    for scope, leaves in params.items():
        if scope.endswith(_QUANT_SUFFIXES) and "w" in leaves:
            w = jnp.asarray(leaves["w"], jnp.float32)
            scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
            q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
            new = {"w_int8": q, "w_scale": scale}
            for name, leaf in leaves.items():
                if name != "w":
                    new[name] = leaf
            out[scope] = new
        else:
            out[scope] = leaves
    return out


def dequantize_gpt_params(params: Params) -> Params:
    """Inverse transform (f32 weights) — for tests and round-trip checks."""
    out: Params = {}
    for scope, leaves in params.items():
        if "w_int8" in leaves:
            new = {
                "w": leaves["w_int8"].astype(jnp.float32) * leaves["w_scale"]
            }
            for name, leaf in leaves.items():
                if name not in ("w_int8", "w_scale"):
                    new[name] = leaf
            out[scope] = new
        else:
            out[scope] = leaves
    return out
