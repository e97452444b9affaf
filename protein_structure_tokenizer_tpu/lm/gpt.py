"""RoPE GPT decoder over structure tokens.

Functional re-implementation of the reference LM
(/root/reference/scripts/lm/gpt_model.py:34-339, gpt_layer.py:80-613) with:

  * parameter scopes byte-identical to the released joblib checkpoints
    (``gpt_decoder/gpt_decoder_layer_{i}/~/...``), so GPT weights load
    without renaming;
  * the generation-time architecture knobs baked in the reference CLI
    (layer-norm pre-norm, sequential attention+FFN, no dropout;
    gpt_generation.py:147-151) as defaults;
  * a **KV cache** for O(L^2) total generation — the reference re-runs the
    full O(L^2)-per-step forward with no cache (gpt_layer.py:272-275); a
    cacheless mode is kept for equivalence testing.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import Mesh, PartitionSpec as P

from protein_structure_tokenizer_tpu.models.layers import layer_norm, linear, rms_norm
from protein_structure_tokenizer_tpu.parallel import tp
from protein_structure_tokenizer_tpu.utils.params import Params, subtree
from protein_structure_tokenizer_tpu.models.init import variance_scaling_truncated_fan_in


@dataclasses.dataclass(frozen=True)
class GptConfig:
    vocab_size: int
    embed_dim: int = 1024
    ffn_embed_dim: int = 4096
    num_heads: int = 16
    num_layers: int = 20
    rope_dimensions: Optional[int] = 8
    max_position_embeddings: int = 514
    ffn_activation: str = "swish"
    use_glu_in_ffn: bool = True
    norm_type: str = "layer_norm"  # released generation config
    parallel_attention_ff: bool = False
    add_bias_ffn: bool = False
    add_bias_attn: bool = False
    add_bias_lm_head: bool = False
    # token ids
    bos_token_id: int = 0
    eos_token_id: int = 1
    pad_token_id: int = 2
    # Mixture-of-experts (framework extension — the reference LM is dense).
    # num_experts > 0 swaps the MLP of every ``moe_layer_stride``-th block for
    # a top-k-routed MoE (lm/moe.py); experts shard over the "expert" mesh
    # axis (parallel/ep.py).
    num_experts: int = 0
    num_selected_experts: int = 2
    expert_capacity_factor: float = 1.25
    moe_layer_stride: int = 1

    def __post_init__(self):
        # Mirrors the reference's GptConfig validation (gpt_model.py:100-121).
        if self.embed_dim % self.num_heads != 0:
            raise ValueError(
                f"embed_dim ({self.embed_dim}) must be divisible by num_heads "
                f"({self.num_heads})"
            )
        if self.num_experts:
            if self.num_selected_experts < 1 or self.num_selected_experts > self.num_experts:
                raise ValueError(
                    f"num_selected_experts ({self.num_selected_experts}) must be "
                    f"in [1, num_experts={self.num_experts}]"
                )
            if self.moe_layer_stride < 1:
                raise ValueError("moe_layer_stride must be >= 1")
        if self.rope_dimensions is not None:
            if self.rope_dimensions <= 0 or self.rope_dimensions % 2 != 0:
                raise ValueError("rope_dimensions must be a positive even number")
            if self.rope_dimensions > self.key_size:
                raise ValueError(
                    f"rope_dimensions ({self.rope_dimensions}) cannot exceed the "
                    f"per-head key size ({self.key_size} = embed_dim/num_heads)"
                )

    @property
    def key_size(self) -> int:
        return self.embed_dim // self.num_heads

    def is_moe_layer(self, i: int) -> bool:
        """Every ``moe_layer_stride``-th block (aligned so the LAST block is
        always MoE) carries the expert MLP."""
        if not self.num_experts:
            return False
        return (self.num_layers - 1 - i) % self.moe_layer_stride == 0


def released_gpt_config(codebook_size: int) -> GptConfig:
    """The released GPT variants: vocab = codebook + bos/eos/pad
    (config/lm/model/gpt_*_df_1.yaml)."""
    return GptConfig(
        vocab_size=codebook_size + 3,
        bos_token_id=codebook_size,
        eos_token_id=codebook_size + 1,
        pad_token_id=codebook_size + 2,
        max_position_embeddings=514,
    )


def _activation(name: str):
    return {
        "swish": jax.nn.swish,
        "silu": jax.nn.silu,
        "gelu": jax.nn.gelu,
        "gelu-no-approx": lambda x: jax.nn.gelu(x, approximate=False),
        "relu": jax.nn.relu,
        "sin": jnp.sin,
    }[name]


def rope_sincos_table(num_pos: int, dim: int) -> np.ndarray:
    """(num_pos, dim): first half sines, second half cosines (GPT-J layout)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, dim, 2) / dim))
    angles = np.einsum("i,j->ij", np.arange(num_pos), inv_freq)
    sentinel = dim // 2 + dim % 2
    table = np.zeros((num_pos, dim), dtype=np.float32)
    table[:, :sentinel] = np.sin(angles)
    table[:, sentinel:] = np.cos(angles)
    return table


def _rotate_every_two(x: jax.Array) -> jax.Array:
    rotated = jnp.stack([-x[..., 1::2], x[..., ::2]], axis=-1)
    return rotated.reshape(rotated.shape[:-2] + (-1,))


def apply_rope(x: jax.Array, sincos: Tuple[jax.Array, jax.Array]) -> jax.Array:
    """x (B, T, H, rot_dim); sincos = (sin (B,T,d/2), cos (B,T,d/2))."""
    sin, cos = sincos
    sin = jnp.repeat(sin[:, :, None, :], 2, axis=3)
    cos = jnp.repeat(cos[:, :, None, :], 2, axis=3)
    return x * cos + _rotate_every_two(x) * sin


def _norm(p: Params, cfg: GptConfig, name: str, x: jax.Array) -> jax.Array:
    # f32 island: normalization statistics are computed in f32 even when the
    # residual stream runs bf16 (no-op upcast on the all-f32 path).
    xf = x.astype(jnp.float32)
    if cfg.norm_type == "layer_norm":
        return layer_norm(p[f"{name}_layer_norm"], xf).astype(x.dtype)
    return rms_norm(p[f"{name}_RMS_norm"], xf).astype(x.dtype)


def attention(
    p: Params,
    cfg: GptConfig,
    x: jax.Array,  # (B, T, C)
    attention_mask: jax.Array,  # broadcastable to (B, H, Tq, Tk)
    kv_cache: Optional[dict] = None,
    cache_index: Optional[jax.Array] = None,
    mesh: Optional[Mesh] = None,
) -> tuple[jax.Array, Optional[dict]]:
    batch, t, _ = x.shape
    h, k_size = cfg.num_heads, cfg.key_size
    rot = cfg.rope_dimensions or k_size

    # Tensor parallelism (parallel/tp.py): qkv are column-sharded so the head
    # axis lands split over the "model" mesh axis; the single constraint after
    # the reshape pins that layout, and the row-sharded out_linear contraction
    # makes GSPMD insert the block's one psum.
    head_spec = P(tp.DATA_AXIS, None, tp.MODEL_AXIS, None)

    if "qkv_linear" in p:
        # Fused projection (fuse_qkv_params): one (C, 3C) matmul instead of
        # three — fewer per-step ops on the KV-cached decode path, where op
        # count (not FLOPs) bounds small-batch sampling.
        qkv = linear(p["qkv_linear"], x).reshape(batch, t, 3, h, k_size)
        queries, keys, values = (
            qkv[:, :, 0],
            qkv[:, :, 1],
            qkv[:, :, 2],
        )
    else:
        keys = linear(p["key_linear"], x).reshape(batch, t, h, k_size)
        queries = linear(p["query_linear"], x).reshape(batch, t, h, k_size)
        values = linear(p["value_linear"], x).reshape(batch, t, h, k_size)
    keys = tp.constrain(keys, mesh, head_spec)
    queries = tp.constrain(queries, mesh, head_spec)
    values = tp.constrain(values, mesh, head_spec)

    positions = jnp.arange(t)[None]
    if cache_index is not None:
        positions = positions + cache_index
    # The table is cast to the compute dtype (bf16 under the half-precision
    # generate path) so RoPE does not silently promote keys/queries to f32.
    table = jnp.asarray(
        rope_sincos_table(cfg.max_position_embeddings, rot), dtype=keys.dtype
    )
    sincos = jnp.take(table, positions, axis=0)  # (B|1, T, rot)
    sincos = jnp.broadcast_to(sincos, (batch, t, rot))
    sin, cos = jnp.split(sincos, 2, axis=-1)

    k_rot = apply_rope(keys[..., :rot], (sin, cos))
    q_rot = apply_rope(queries[..., :rot], (sin, cos))
    keys = jnp.concatenate([k_rot, keys[..., rot:]], axis=-1)
    queries = jnp.concatenate([q_rot, queries[..., rot:]], axis=-1)

    k_scale = v_scale = None
    if kv_cache is not None and "k_scale" in kv_cache:
        # int8 KV cache: keys/values stored int8 with one f32 scale per
        # (batch, position, head) vector.  The scales FOLD into the existing
        # matmuls — k_scale is a per-key-column factor applied to the QK
        # logits, v_scale premultiplies the probability weights — so the
        # cache crosses HBM as int8 bytes and no dequantized copy exists.
        kq, ks = _quantize_kv(keys)
        vq, vs = _quantize_kv(values)
        kv_cache = {
            "k": _cache_update(kv_cache["k"], kq, cache_index),
            "k_scale": _cache_update_scale(kv_cache["k_scale"], ks, cache_index),
            "v": _cache_update(kv_cache["v"], vq, cache_index),
            "v_scale": _cache_update_scale(kv_cache["v_scale"], vs, cache_index),
        }
        keys = kv_cache["k"].astype(x.dtype)
        values = kv_cache["v"].astype(x.dtype)
        k_scale = kv_cache["k_scale"]  # (B, T, H) f32
        v_scale = kv_cache["v_scale"]
    elif kv_cache is not None:
        # Insert this step's keys/values at cache_index and attend to the cache.
        keys = _cache_update(kv_cache["k"], keys, cache_index)
        values = _cache_update(kv_cache["v"], values, cache_index)
        kv_cache = {"k": keys, "v": values}

    # f32 softmax island: QK products accumulate in f32 regardless of the
    # compute dtype, the softmax normalizes in f32, and only the probability
    # weights are cast back for the values contraction.  Bit-identical on
    # the all-f32 path (preferred_element_type=f32 is the default there).
    logits = jnp.einsum(
        "...thd,...Thd->...htT", queries, keys,
        preferred_element_type=jnp.float32,
    )
    if k_scale is not None:
        logits = logits * jnp.transpose(k_scale, (0, 2, 1))[..., None, :]
    logits = logits / jnp.sqrt(jnp.float32(keys.shape[-1]))
    logits = jnp.where(attention_mask, logits, -1e30)
    weights = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        weights = weights * jnp.transpose(v_scale, (0, 2, 1))[..., None, :]
    weights = weights.astype(values.dtype)
    out = jnp.einsum("...htT,...Thd->...thd", weights, values)
    out = out.reshape(batch, t, -1)
    return linear(p["out_linear"], out), kv_cache


def _cache_update(cache: jax.Array, new: jax.Array, index: jax.Array) -> jax.Array:
    """Write `new` (B, t, H, D) into `cache` (B, T, H, D) at position `index`."""
    return jax.lax.dynamic_update_slice(
        cache, new.astype(cache.dtype), (0, index.astype(jnp.int32), 0, 0)
    )


def _cache_update_scale(cache: jax.Array, new: jax.Array, index: jax.Array) -> jax.Array:
    """Write `new` (B, t, H) into the scale buffer (B, T, H) at `index`."""
    return jax.lax.dynamic_update_slice(
        cache, new.astype(cache.dtype), (0, index.astype(jnp.int32), 0)
    )


def _quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-(batch, position, head)-vector int8 quantization of a
    fresh key/value block (B, t, H, D) -> (int8 (B, t, H, D), f32 (B, t, H))."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def decoder_layer(
    p: Params,
    cfg: GptConfig,
    x: jax.Array,
    attention_mask: jax.Array,
    kv_cache: Optional[dict] = None,
    cache_index: Optional[jax.Array] = None,
    mesh: Optional[Mesh] = None,
    pad_mask: Optional[jax.Array] = None,
) -> tuple[jax.Array, Optional[dict], dict]:
    """Returns (x, kv_cache, aux); aux carries MoE load-balance/z losses and
    is empty ({}) on dense layers.  ``pad_mask`` (B, T) excludes pad tokens
    from MoE routing/capacity/aux stats."""
    act = _activation(cfg.ffn_activation)
    hidden_spec = P(tp.DATA_AXIS, None, tp.MODEL_AXIS)
    aux: dict = {}

    if "moe/router" in p:
        if not cfg.num_experts:
            raise ValueError(
                "params contain MoE expert weights but the config has "
                "num_experts=0 — pass the --num_experts (and "
                "--num_selected_experts/--moe_layer_stride) the model was "
                "trained with"
            )
        from protein_structure_tokenizer_tpu.lm import moe as moe_lib

        moe_p = subtree(p, "moe")

        def mlp(h):
            y, moe_aux = moe_lib.moe_mlp(
                moe_p,
                h,
                num_experts=cfg.num_experts,
                num_selected=cfg.num_selected_experts,
                capacity_factor=cfg.expert_capacity_factor,
                activation=act,
                use_glu=cfg.use_glu_in_ffn,
                mesh=mesh,
                valid=pad_mask,
            )
            aux.update(moe_aux)
            return y

    else:
        def mlp(h):
            if cfg.use_glu_in_ffn:
                glu_p = p["fc1_linear_glu"]
                if "w_gate" in glu_p:
                    # Tensor-parallel placement (tp.shard_gpt_params) stores
                    # the two GLU halves as separate column-sharded leaves:
                    # the global halves of the fused (E, 2F) weight would
                    # each span only half the "model" axis and force a
                    # reshard before the elementwise product.
                    x1 = jnp.matmul(h, glu_p["w_gate"], preferred_element_type=h.dtype)
                    x2 = jnp.matmul(h, glu_p["w_value"], preferred_element_type=h.dtype)
                    x1 = tp.constrain(x1, mesh, hidden_spec)
                    x2 = tp.constrain(x2, mesh, hidden_spec)
                else:
                    x1, x2 = jnp.split(linear(glu_p, h), 2, axis=-1)
                h = act(x1) * x2
            else:
                h = tp.constrain(act(linear(p["fc1_linear"], h)), mesh, hidden_spec)
            return linear(p["fc2_linear"], h)

    if cfg.parallel_attention_ff:
        normed = _norm(p, cfg, "attn", x)
        attn_out, kv_cache = attention(
            subtree(p, "self_attn/~"), cfg, normed, attention_mask, kv_cache,
            cache_index, mesh=mesh,
        )
        return x + attn_out + mlp(normed), kv_cache, aux

    normed = _norm(p, cfg, "attn", x)
    attn_out, kv_cache = attention(
        subtree(p, "self_attn/~"), cfg, normed, attention_mask, kv_cache,
        cache_index, mesh=mesh,
    )
    x = x + attn_out
    x = x + mlp(_norm(p, cfg, "ffn", x))
    return x, kv_cache, aux


def build_causal_mask(batch: int, seq_len: int) -> jax.Array:
    return jnp.tril(jnp.ones((1, 1, seq_len, seq_len), bool))


def _final_norm_and_logits(
    p: Params, cfg: GptConfig, x: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Final norm + LM head with an f32 logits island: the head matmul runs
    in the compute dtype on the MXU but ACCUMULATES f32, so samplers always
    see f32 logits (bit-identical on the all-f32 path).  Returns
    (embeddings in compute dtype, logits f32)."""
    xf = x.astype(jnp.float32)
    if cfg.norm_type == "layer_norm":
        xf = layer_norm(p["~/final_layer_norm"], xf)
    else:
        xf = rms_norm(p["~/final_RMS_norm"], xf)
    head = p["~/simple_lm_head/~/lm_final_fc"]
    normed = xf.astype(x.dtype)
    logits = jnp.matmul(normed, head["w"], preferred_element_type=jnp.float32)
    if "b" in head:
        logits = logits + head["b"].astype(jnp.float32)
    return normed, logits


def forward(
    params: Params,
    cfg: GptConfig,
    token_ids: jax.Array,  # (B, T)
    attention_mask: Optional[jax.Array] = None,
    *,
    mesh: Optional[Mesh] = None,
    sequence_parallel: bool = False,
) -> dict:
    """Full non-cached forward — numerically equivalent to the reference.

    ``mesh`` with a "model" axis enables tensor parallelism; params must then
    be placed with :func:`parallel.tp.shard_gpt_params`.
    ``sequence_parallel`` additionally shards the residual stream along T
    over the "model" axis between blocks (Megatron-SP): LN/residual segments
    run on sequence shards and the block psums become reduce-scatter +
    all-gather pairs.
    """
    p = subtree(params, "gpt_decoder")
    x = jnp.take(p["~/token_embed"]["embeddings"], token_ids, axis=0)
    sp = sequence_parallel and tp.has_model_axis(mesh)
    if sp:
        x = tp.constrain(x, mesh, tp.SP_SPEC)
    if attention_mask is None:
        attention_mask = build_causal_mask(1, x.shape[1])
    pad_mask = (
        (token_ids != cfg.pad_token_id) if cfg.num_experts else None
    )
    moe_aux: dict = {}
    for i in range(cfg.num_layers):
        x, _, aux = decoder_layer(
            subtree(p, f"gpt_decoder_layer_{i}/~"), cfg, x, attention_mask,
            mesh=mesh, pad_mask=pad_mask,
        )
        for k, v in aux.items():
            moe_aux[k] = moe_aux.get(k, 0.0) + v
        if sp:
            x = tp.constrain(x, mesh, tp.SP_SPEC)
    x, logits = _final_norm_and_logits(p, cfg, x)
    out = {"embeddings": x, "logits": logits}
    if moe_aux:
        # Mean over the MoE layers so loss weights are depth-independent.
        n_moe = sum(cfg.is_moe_layer(i) for i in range(cfg.num_layers))
        out.update({k: v / n_moe for k, v in moe_aux.items()})
    return out


# ---------------------------------------------------------------------------
# KV-cache incremental decoding
# ---------------------------------------------------------------------------


def init_kv_cache(
    cfg: GptConfig,
    batch: int,
    max_len: int,
    *,
    mesh: Optional[Mesh] = None,
    dtype=jnp.float32,
    int8: bool = False,
) -> list:
    """``dtype`` should match the parameter dtype: the cache READ is the
    dominant HBM traffic of a KV-cached step (2 x layers x B x T x C bytes
    vs one read of the params), so a bf16 cache halves the step's bound.

    ``int8=True`` stores keys/values int8 with one f32 scale per
    (batch, position, head) vector — half the bf16 cache bytes again; the
    scales fold into the attention matmuls (see :func:`attention`)."""
    shape = (batch, max_len, cfg.num_heads, cfg.key_size)

    def zeros(s=shape, dt=None, spec=P(tp.DATA_AXIS, None, tp.MODEL_AXIS, None)):
        z = jnp.zeros(s, dtype if dt is None else dt)
        # Under tensor parallelism the cache shards with the head axis (same
        # layout the attention constraint pins for fresh keys/values).
        return tp.constrain(z, mesh, spec)

    if int8:
        scale_shape = (batch, max_len, cfg.num_heads)
        scale_spec = P(tp.DATA_AXIS, None, tp.MODEL_AXIS)
        return [
            {
                "k": zeros(dt=jnp.int8),
                "k_scale": zeros(scale_shape, jnp.float32, scale_spec),
                "v": zeros(dt=jnp.int8),
                "v_scale": zeros(scale_shape, jnp.float32, scale_spec),
            }
            for _ in range(cfg.num_layers)
        ]
    return [{"k": zeros(), "v": zeros()} for _ in range(cfg.num_layers)]


def forward_step(
    params: Params,
    cfg: GptConfig,
    token_ids: jax.Array,  # (B, t) current step's token(s)
    cache: list,
    cache_index: jax.Array,  # scalar int: number of tokens already cached
    *,
    mesh: Optional[Mesh] = None,
) -> tuple[jax.Array, list]:
    """One incremental step; returns (logits (B, vocab), updated cache).

    ``token_ids`` may carry t > 1 tokens (PREFILL: condition the cache on a
    whole prompt in one dispatch — each query position attends causally
    within the block and to everything already cached); the returned logits
    are always those of the LAST position."""
    p = subtree(params, "gpt_decoder")
    x = jnp.take(p["~/token_embed"]["embeddings"], token_ids, axis=0)
    batch, t = token_ids.shape
    max_len = cache[0]["k"].shape[1]
    # Query position i (global cache_index + i) attends to every cached/new
    # key at global position <= its own — for t == 1 this is the familiar
    # "everything <= cache_index" row.
    key_pos = jnp.arange(max_len)[None, None, None, :]
    query_pos = cache_index + jnp.arange(t)[None, None, :, None]
    attention_mask = key_pos <= query_pos

    pad_mask = (
        (token_ids != cfg.pad_token_id) if cfg.num_experts else None
    )
    new_cache = []
    for i in range(cfg.num_layers):
        x, layer_cache, _ = decoder_layer(
            subtree(p, f"gpt_decoder_layer_{i}/~"),
            cfg,
            x,
            attention_mask,
            kv_cache=cache[i],
            cache_index=cache_index,
            mesh=mesh,
            pad_mask=pad_mask,
        )
        new_cache.append(layer_cache)
    _, logits = _final_norm_and_logits(p, cfg, x)
    return logits[:, -1], new_cache


def fuse_qkv_params(params: Params, cfg: GptConfig) -> Params:
    """Concatenate each layer's query/key/value projection weights into one
    ``qkv_linear`` leaf of shape (C, 3*C), column blocks [q | k | v]
    (matching attention's (3, H, D) reshape of the fused output).

    An inference-time layout transform for the sampling path: one matmul per
    layer instead of three.  Logits are algebraically identical (each output
    column accumulates the same products).  Not compatible with
    ``tp.shard_gpt_params`` (which shards the separate leaves); fuse only
    for single-chip/data-parallel generation.
    """
    del cfg  # layout is block-concat; no head interleaving needed
    out: Params = {}
    for scope, leaves in params.items():
        if scope.endswith("/self_attn/~/query_linear"):
            base = scope[: -len("query_linear")]
            wq = params[base + "query_linear"]["w"]
            wk = params[base + "key_linear"]["w"]
            wv = params[base + "value_linear"]["w"]
            out[base + "qkv_linear"] = {
                "w": jnp.concatenate([wq, wk, wv], axis=1)
            }
        elif scope.endswith(("/self_attn/~/key_linear", "/self_attn/~/value_linear")):
            continue
        else:
            out[scope] = leaves
    return out


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init(key, cfg: GptConfig) -> Params:
    params: Params = {}
    ks = jax.random.split(key, cfg.num_layers + 2)
    params["gpt_decoder/~/token_embed"] = {
        "embeddings": jax.random.truncated_normal(
            ks[0], -2, 2, (cfg.vocab_size, cfg.embed_dim), jnp.float32
        )
        * 0.02
    }
    ffn_out = 2 * cfg.ffn_embed_dim if cfg.use_glu_in_ffn else cfg.ffn_embed_dim
    fc1_name = "fc1_linear_glu" if cfg.use_glu_in_ffn else "fc1_linear"
    for i in range(cfg.num_layers):
        kq, kk, kv, ko, k1, k2 = jax.random.split(ks[i + 1], 6)
        base = f"gpt_decoder/gpt_decoder_layer_{i}/~"
        for name, kk_ in (
            ("query_linear", kq),
            ("key_linear", kk),
            ("value_linear", kv),
            ("out_linear", ko),
        ):
            params[f"{base}/self_attn/~/{name}"] = {
                "w": variance_scaling_truncated_fan_in(kk_, (cfg.embed_dim, cfg.embed_dim))
            }
        if cfg.is_moe_layer(i):
            from protein_structure_tokenizer_tpu.lm import moe as moe_lib

            moe_params = moe_lib.init_moe_params(
                k1,
                num_experts=cfg.num_experts,
                embed_dim=cfg.embed_dim,
                ffn_dim=cfg.ffn_embed_dim,
                use_glu=cfg.use_glu_in_ffn,
            )
            for sub_scope, leaves in moe_params.items():
                params[f"{base}/moe/{sub_scope}"] = leaves
        else:
            params[f"{base}/{fc1_name}"] = {
                "w": variance_scaling_truncated_fan_in(k1, (cfg.embed_dim, ffn_out))
            }
            params[f"{base}/fc2_linear"] = {
                "w": variance_scaling_truncated_fan_in(k2, (cfg.ffn_embed_dim, cfg.embed_dim))
            }
        if cfg.norm_type == "layer_norm":
            params[f"{base}/attn_layer_norm"] = {
                "scale": jnp.ones((cfg.embed_dim,)),
                "offset": jnp.zeros((cfg.embed_dim,)),
            }
            if not cfg.parallel_attention_ff:
                params[f"{base}/ffn_layer_norm"] = {
                    "scale": jnp.ones((cfg.embed_dim,)),
                    "offset": jnp.zeros((cfg.embed_dim,)),
                }
        else:
            params[f"{base}/attn_RMS_norm"] = {"scale": jnp.ones((cfg.embed_dim,))}
            if not cfg.parallel_attention_ff:
                params[f"{base}/ffn_RMS_norm"] = {"scale": jnp.ones((cfg.embed_dim,))}
    if cfg.norm_type == "layer_norm":
        params["gpt_decoder/~/final_layer_norm"] = {
            "scale": jnp.ones((cfg.embed_dim,)),
            "offset": jnp.zeros((cfg.embed_dim,)),
        }
    else:
        params["gpt_decoder/~/final_RMS_norm"] = {"scale": jnp.ones((cfg.embed_dim,))}
    head = {"w": variance_scaling_truncated_fan_in(ks[-1], (cfg.embed_dim, cfg.vocab_size))}
    if cfg.add_bias_lm_head:
        head["b"] = jnp.zeros((cfg.vocab_size,))
    params["gpt_decoder/~/simple_lm_head/~/lm_final_fc"] = head
    return params
