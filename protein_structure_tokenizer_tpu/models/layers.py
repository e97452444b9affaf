"""Primitive NN layers as pure functions over flat param subtrees.

Leaf naming follows the two conventions present in the reference release so
that its checkpoints load directly:

  * ``{"w", "b"}``        — plain Linear (haiku convention), y = x @ w + b.
  * ``{"weights","bias"}``— AF2-style Linear with arbitrary input/output rank
    (/root/reference/structure_tokenizer/model/common_modules.py:53-139).
  * ``{"scale","offset"}``— LayerNorm over the last axis.

All computation is float32 and batched; no per-sample vmap is required.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.models.init import (
    af2_linear_init,
    variance_scaling_truncated_fan_in,
)

Leaves = dict


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def linear(p: Leaves, x: jax.Array) -> jax.Array:
    """Plain Linear on the last axis; leaves {"w": (in,out), "b": (out,)}.

    Also accepts the weight-only int8 layout produced by
    ``lm.quant.quantize_gpt_params_int8`` — ``{"w_int8": int8 (in,out),
    "w_scale": f32 (out,)}``: the weights cross HBM as int8 (XLA fuses the
    convert into the matmul operand read) and the per-output-column scale
    multiplies the f32-upcast output, algebraically identical to scaling the
    weight columns up front.
    """
    if "w_int8" in p:
        y = jnp.matmul(
            x, p["w_int8"].astype(x.dtype), preferred_element_type=x.dtype
        )
        y = (y.astype(jnp.float32) * p["w_scale"]).astype(x.dtype)
    else:
        y = jnp.matmul(x, p["w"], preferred_element_type=x.dtype)
    b = p.get("b")
    if b is not None:
        y = y + b
    return y


def linear_init(key, in_dim: int, out_dim: int, *, use_bias: bool = True) -> Leaves:
    leaves = {"w": variance_scaling_truncated_fan_in(key, (in_dim, out_dim))}
    if use_bias:
        leaves["b"] = jnp.zeros((out_dim,), jnp.float32)
    return leaves


def af2_linear(p: Leaves, x: jax.Array, *, num_input_dims: int = 1) -> jax.Array:
    """AF2 Linear; leaves {"weights": in_shape+out_shape, "bias": out_shape}."""
    w = p["weights"]
    if num_input_dims == 1:
        y = jnp.matmul(x, w.reshape(w.shape[0], -1), preferred_element_type=x.dtype)
        y = y.reshape(x.shape[:-1] + w.shape[1:])
    else:
        in_letters = "abcde"[:num_input_dims]
        out_letters = "hijkl"[: w.ndim - num_input_dims]
        eq = f"...{in_letters}, {in_letters}{out_letters}->...{out_letters}"
        y = jnp.einsum(eq, x, w)
    if "bias" in p:
        y = y + p["bias"]
    return y


def af2_linear_init_leaves(
    key,
    in_shape: Sequence[int],
    out_shape: Sequence[int],
    *,
    initializer: str = "linear",
    use_bias: bool = True,
    bias_init: float = 0.0,
) -> Leaves:
    shape = tuple(in_shape) + tuple(out_shape)
    leaves = {"weights": af2_linear_init(key, shape, initializer, len(in_shape))}
    if use_bias:
        leaves["bias"] = jnp.full(tuple(out_shape), bias_init, jnp.float32)
    return leaves


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def layer_norm(p: Leaves, x: jax.Array, *, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis (two-pass variance, as the reference)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    inv = p["scale"] * jax.lax.rsqrt(var + eps)
    return inv * (x - mean) + p["offset"]


def layer_norm_1pass(p: Leaves, x: jax.Array, *, eps: float = 1e-5) -> jax.Array:
    """LayerNorm with one-pass statistics: var = E[x^2] - E[x]^2.

    Both moments come from ONE variadic ``lax.reduce`` so the statistics cost
    a single read of ``x`` (profiled: two separate ``jnp.mean`` reductions are
    NOT fused by XLA — each re-reads the full tensor, ~7 ms per pass on a
    (32, 512, 512, 128) f32 pair tensor).  The one-pass variance loses ~half
    the float mantissa when |mean| >> std; activations are LN-scale (O(1)
    mean and std) so the drift is ~1e-6 — exact/conformance paths keep
    :func:`layer_norm`.
    """
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    xa = x.astype(acc_dtype)
    zero = jnp.zeros((), acc_dtype)

    def both(a, b):
        return (a[0] + b[0], a[1] + b[1])

    s, s2 = jax.lax.reduce(
        (xa, jnp.square(xa)), (zero, zero), both, dimensions=(x.ndim - 1,)
    )
    denom = 1.0 / x.shape[-1]
    mean = (s * denom)[..., None].astype(x.dtype)
    mean_sq = (s2 * denom)[..., None].astype(x.dtype)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = p["scale"] * jax.lax.rsqrt(var + eps)
    return inv * (x - mean) + p["offset"]


def layer_norm_fast(
    p: Leaves, x: jax.Array, *, eps: float = 1e-5, use_pallas: bool = False
) -> jax.Array:
    """``layer_norm_1pass`` with an optional Pallas single-pass kernel for
    big bf16 tensors (ops/ln_kernels.py: one HBM read+write instead of a
    separate moments reduce + normalize pass).  Callers gate ``use_pallas``
    on TPU + single-device mesh; anything the kernel cannot tile falls back
    to the jnp one-pass path."""
    if use_pallas and x.dtype == jnp.bfloat16 and jax.default_backend() == "tpu":
        from protein_structure_tokenizer_tpu.ops import ln_kernels

        out = ln_kernels.fused_layer_norm(x, p["scale"], p["offset"], eps=eps)
        if out is not None:
            return out
    return layer_norm_1pass(p, x, eps=eps)


def rms_norm(p: Leaves, x: jax.Array, *, eps: float = 1e-6) -> jax.Array:
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * p["scale"] * jax.lax.rsqrt(var + eps)


def masked_layer_norm(p: Leaves, x: jax.Array, mask: jax.Array, *, eps: float = 1e-5) -> jax.Array:
    """Masked LayerNorm replicating the reference's exact (quirky) numerics.

    The reference multiplies the input by the mask *before* the mean and then
    masks **again** inside the mean, and divides by the full channel count
    rather than the mask sum (/root/reference/structure_tokenizer/model/
    gnn_layers.py:108-164).  Padded rows therefore normalize to
    ``offset`` exactly.  Replicated bit-for-bit on purpose: this feeds the
    conformance (token-id parity) path.
    """
    x = mask * x
    mean = jnp.mean(mask * x, axis=-1, keepdims=True)
    var = jnp.mean(mask * jnp.square(x - mean), axis=-1, keepdims=True)
    inv = p["scale"] * jax.lax.rsqrt(var + eps)
    return inv * (x - mean) + p["offset"]


def norm_init(dim: int) -> Leaves:
    return {"scale": jnp.ones((dim,), jnp.float32), "offset": jnp.zeros((dim,), jnp.float32)}


# ---------------------------------------------------------------------------
# MLP (haiku hk.nets.MLP layout: sublayers "linear_0", "linear_1", ...)
# ---------------------------------------------------------------------------


def mlp(params_by_layer: Sequence[Leaves], x: jax.Array, activation) -> jax.Array:
    """MLP applying ``activation`` between layers but not after the last."""
    n = len(params_by_layer)
    for i, p in enumerate(params_by_layer):
        x = linear(p, x)
        if i < n - 1:
            x = activation(x)
    return x


def mlp_init(key, dims: Sequence[int]) -> dict:
    """Init leaves for each sublayer, keyed "linear_%d" (hk.nets.MLP naming)."""
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"linear_{i}": linear_init(keys[i], dims[i], dims[i + 1])
        for i in range(len(dims) - 1)
    }
