"""Token-sequence generation: temperature / top-k / top-p sampling.

Two engines:

  * ``generate(..., use_cache=True)`` — KV-cache incremental decoding under a
    single jitted ``lax.scan``: O(L) per step instead of the reference's
    full-block O(L^2) re-forward per step (generation_utils.py:26-190).
  * ``use_cache=False`` — the reference's exact full-forward recipe, kept for
    distribution-equivalence testing.

Sampling formulas and PRNG key discipline replicate the reference exactly, so
given identical logits both engines sample identical tokens.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.lm import gpt
from protein_structure_tokenizer_tpu.utils.params import Params


def sample_temperature(key, logits, temperature: float = 1.0):
    return jax.random.categorical(key, logits / temperature, axis=-1)


def sample_top_k(key, logits, k: int = 5, temperature: float = 1.0):
    selected_logits, selected_idx = jax.lax.top_k(logits, k)
    sub = jax.random.categorical(key, selected_logits / temperature, axis=-1)
    return jnp.take_along_axis(selected_idx, sub[..., None], axis=-1)[..., 0]


def sample_top_p(
    key, logits, top_p: float = 0.2, min_tokens_to_keep: int = 2, temperature: float = 1.0
):
    """Nucleus sampling with the reference's exact masking quirks
    (generation_utils.py:117-190)."""
    batch, vocab = logits.shape
    sorted_logits, sorted_idx = jax.lax.top_k(logits, vocab)
    cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    new_logits = jnp.where(cum_probs <= top_p, sorted_logits, -jnp.inf)
    min_keep = jnp.where(
        jnp.arange(vocab)[None] < min_tokens_to_keep, sorted_logits, -jnp.inf
    )
    logits_to_sample = jnp.where(
        (new_logits > -jnp.inf) & (min_keep > -jnp.inf), min_keep, new_logits
    )
    sub = jax.random.categorical(key, logits_to_sample / temperature, axis=-1)
    return jnp.take_along_axis(sorted_idx, sub[..., None], axis=-1)[..., 0]


def _sampler(method: str, **kwargs):
    if method == "temperature":
        return functools.partial(sample_temperature, temperature=kwargs.get("temperature", 1.0))
    if method == "top_k":
        return functools.partial(
            sample_top_k, k=kwargs.get("k", 5), temperature=kwargs.get("temperature", 1.0)
        )
    if method == "top_p":
        return functools.partial(
            sample_top_p,
            top_p=kwargs.get("top_p", 0.2),
            min_tokens_to_keep=kwargs.get("min_tokens_to_keep", 2),
            temperature=kwargs.get("temperature", 1.0),
        )
    raise ValueError(f"unknown sampling method {method!r}")


def generate(
    params: Params,
    cfg: gpt.GptConfig,
    key: jax.Array,
    batch_size: int,
    num_tokens: Optional[int] = None,
    *,
    method: str = "temperature",
    use_cache: bool = True,
    stop_at_eos: bool = False,
    cache_segment: Optional[int] = None,
    int8_kv: bool = False,
    prompt: Optional[jax.Array] = None,
    mesh=None,
    **sampling_kwargs,
) -> jax.Array:
    """Generate (batch, num_tokens) sequences starting from BOS.

    Step t samples from the logits at position t and writes at t+1 (the final
    step's write falls off the end, as in the reference).

    ``prompt`` (batch_size, P) — structure-token ids (no BOS/EOS) to
    condition on: the sequence prefix is forced to BOS + prompt and sampling
    continues from there (prefix completion — a framework extension; the
    reference only samples unconditionally from BOS).  On the cached engines
    the whole prefix is PREFILLED in one dispatch (gpt.forward_step accepts
    multi-token blocks with a causal intra-block mask) rather than one step
    per forced token.  Cached and uncached prompted sampling are
    token-identical (one key split per sampled token either way).

    ``stop_at_eos`` exits the sampling loop as soon as EVERY row has emitted
    an EOS (``lax.while_loop`` over the same KV-cached step) — the reference
    always runs the full block (gpt_generation.py:73-81) and strips after
    the first EOS, so typical proteins (~180 tokens of a 514 block) pay ~2.8x
    the needed steps.  Stripped outputs are identical either way (each row's
    pre-EOS prefix samples the same RNG stream); positions after the exit
    keep the BOS fill.  Requires ``use_cache``.

    ``mesh`` with a "model" axis runs the forward tensor-parallel
    (parallel/tp.py); ``params`` must then be placed with
    ``tp.shard_gpt_params``.

    ``int8_kv`` stores the KV cache int8 with per-(batch, position, head)
    f32 scales (half the bf16 cache bytes again; scales fold into the
    attention matmuls — gpt.init_kv_cache / gpt.attention).  Requires
    ``use_cache``; sampled tokens shift within the pinned int8 tolerance
    (tests/test_gpt.py).

    ``cache_segment=S`` grows the KV cache in S-step segments instead of
    allocating ``num_tokens`` up front: step t's attention reads a cache of
    ceil((t+1)/S)*S positions rather than always ``num_tokens``.  The cache
    read is the dominant HBM traffic of a cached step, and early steps are
    the majority of a block, so segmenting cuts average cache traffic ~40%
    at S=num_tokens/4 (one extra XLA scan body per segment; a pad-concat at
    each boundary).  Masked math is unchanged — only the number of fully-
    masked padded positions in each reduction differs, so sampled tokens
    are identical up to reduction-order rounding (pinned in
    tests/test_gpt.py).  Requires ``use_cache``; ignored with
    ``stop_at_eos`` (the while-loop needs one body).
    """
    num_tokens = num_tokens or cfg.max_position_embeddings
    sampler = _sampler(method, **sampling_kwargs)
    tokens = jnp.full((batch_size, num_tokens), cfg.bos_token_id, jnp.int32)

    if stop_at_eos and not use_cache:
        raise ValueError("stop_at_eos requires use_cache=True")
    if int8_kv and not use_cache:
        raise ValueError("int8_kv requires use_cache=True")

    # Prompt conditioning: force BOS + prompt as the sequence prefix and
    # sample the continuation.  prompt_len counts the FORCED positions.
    prompt_len = 0
    if prompt is not None:
        prompt = jnp.asarray(prompt, jnp.int32)
        if prompt.ndim != 2 or prompt.shape[0] != batch_size:
            raise ValueError(
                f"prompt must be (batch_size={batch_size}, P) token ids, "
                f"got shape {prompt.shape}"
            )
        prompt_len = 1 + int(prompt.shape[1])
        if prompt_len >= num_tokens:
            raise ValueError(
                f"prompt of {prompt.shape[1]} tokens leaves no room to "
                f"sample within num_tokens={num_tokens}"
            )
        tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 1))

    if not use_cache:
        def step(carry, t):
            tokens, key = carry
            logits = gpt.forward(params, cfg, tokens, mesh=mesh)["logits"]
            step_logits = jnp.take(logits, t, axis=1)
            key, sub = jax.random.split(key)
            new_token = sampler(sub, step_logits)
            tokens = _write_at(tokens, t + 1, new_token.astype(jnp.int32))
            return (tokens, key), None

        (tokens, _), _ = jax.lax.scan(
            step, (tokens, key),
            jnp.arange(max(prompt_len - 1, 0), num_tokens),
        )
        return tokens

    # Cache dtype follows the parameter dtype: bf16 params (the fast
    # generate path — see runtime.precision.cast_floats) get a bf16 cache,
    # halving the per-step HBM bound; samplers still see f32 logits.  The
    # embedding table is the authority when present — under the int8 path
    # (lm.quant) the weight leaves are int8 with f32 scales, and neither
    # should decide the cache dtype.
    embed = params.get("gpt_decoder/~/token_embed")
    if embed is not None:
        param_dtype = embed["embeddings"].dtype
    else:
        param_dtype = next(
            leaf.dtype
            for leaf in jax.tree_util.tree_leaves(params)
            if jnp.issubdtype(leaf.dtype, jnp.floating)
        )

    def step(carry, t):
        tokens, cache, key = carry
        current = jax.lax.dynamic_slice_in_dim(tokens, t, 1, axis=1)
        logits, cache = gpt.forward_step(params, cfg, current, cache, t, mesh=mesh)
        key, sub = jax.random.split(key)
        new_token = sampler(sub, logits)
        tokens = _write_at(tokens, t + 1, new_token.astype(jnp.int32))
        return (tokens, cache, key), None

    def prefill(tokens, cache, key):
        """Condition the cache on the forced prefix in ONE dispatch; the
        prefix's last-position logits sample the first free token — the same
        one key-split per sampled token as the step loop, so prompted cached
        and uncached engines stay token-identical."""
        forced = tokens[:, :prompt_len]
        logits, cache = gpt.forward_step(
            params, cfg, forced, cache, jnp.int32(0), mesh=mesh
        )
        key, sub = jax.random.split(key)
        new_token = sampler(sub, logits)
        tokens = _write_at(tokens, prompt_len, new_token.astype(jnp.int32))
        return tokens, cache, key

    if cache_segment and not stop_at_eos:
        seg = int(cache_segment)
        first = min(num_tokens, max(seg, -(-prompt_len // seg) * seg))
        cache = gpt.init_kv_cache(
            cfg, batch_size, first, mesh=mesh, dtype=param_dtype, int8=int8_kv,
        )
        if prompt_len:
            tokens, cache, key = prefill(tokens, cache, key)
        carry = (tokens, cache, key)
        for start in range(0, num_tokens, seg):
            end = min(start + seg, num_tokens)
            lo = max(start, prompt_len)
            if lo >= end:
                continue
            tokens, cache, key = carry
            pad = end - cache[0]["k"].shape[1]
            if pad > 0:  # grow the cache to cover this segment's positions
                cache = [
                    {
                        # axis 1 is positions for every buffer (the int8
                        # layout adds 3-D (B, T, H) scale leaves)
                        name: jnp.pad(
                            buf,
                            [(0, pad) if a == 1 else (0, 0) for a in range(buf.ndim)],
                        )
                        for name, buf in layer.items()
                    }
                    for layer in cache
                ]
            carry = (tokens, cache, key)
            carry, _ = jax.lax.scan(step, carry, jnp.arange(lo, end))
        return carry[0]

    cache = gpt.init_kv_cache(
        cfg, batch_size, num_tokens, mesh=mesh, dtype=param_dtype, int8=int8_kv
    )
    if prompt_len:
        tokens, cache, key = prefill(tokens, cache, key)

    if stop_at_eos:
        def cond(carry):
            _, _, _, t, done = carry
            return jnp.logical_and(t < num_tokens, jnp.logical_not(done))

        def body(carry):
            tokens, cache, key, t, _ = carry
            (tokens, cache, key), _ = step((tokens, cache, key), t)
            # a row is finished once any EOS appears after position 0 (BOS
            # fill uses bos_token_id, so only sampled EOS can match; prompts
            # are structure tokens and cannot contain EOS)
            done = (tokens[:, 1:] == cfg.eos_token_id).any(axis=1).all()
            return (tokens, cache, key, t + 1, done)

        tokens, _, _, _, _ = jax.lax.while_loop(
            cond, body, (tokens, cache, key, jnp.int32(prompt_len), jnp.bool_(False))
        )
        return tokens

    (tokens, _, _), _ = jax.lax.scan(
        step, (tokens, cache, key), jnp.arange(prompt_len, num_tokens)
    )
    return tokens


def random_sampling(
    key: jax.Array,
    max_len: int,
    num_sequences: int,
    average_num_struct_tokens: int,
    codebook_size: int,
    eos_token_id: int,
    bos_token_id: int,
) -> jax.Array:
    """Length-matched random-token baseline (generation_utils.py:193-257).

    Sequence lengths ~ Poisson(average_num_struct_tokens) clipped to max_len;
    tokens uniform over the codebook; rows padded with EOS after the sampled
    length and framed with BOS/EOS.  Returns (num_sequences, max_len + 2).
    """
    lengths = jnp.clip(
        jax.random.poisson(key, lam=average_num_struct_tokens, shape=(num_sequences,)),
        max=max_len,
    )
    key, _ = jax.random.split(key)  # reference key discipline: split, draw with first
    seqs = jax.random.randint(
        key, shape=(num_sequences, max_len), minval=0, maxval=codebook_size
    )
    in_range = jnp.arange(max_len)[None] < lengths[:, None]
    seqs = jnp.where(in_range, seqs, eos_token_id)
    return jnp.pad(
        jnp.pad(seqs, ((0, 0), (1, 0)), constant_values=bos_token_id),
        ((0, 0), (0, 1)),
        constant_values=eos_token_id,
    )


def _write_at(tokens: jax.Array, index: jax.Array, values: jax.Array) -> jax.Array:
    """tokens[:, index] = values, dropping out-of-bounds writes (like .at[].set
    with default OOB semantics in the reference)."""
    return tokens.at[:, index].set(values, mode="drop")


def strip_special_tokens(sequence, bos_token_id: int, eos_token_id: int):
    """Unpad a generated row: keep tokens before the first EOS, drop BOS/EOS."""
    import numpy as np

    seq = np.asarray(sequence)
    before_eos = np.cumsum(seq == eos_token_id) == 0
    seq = seq[before_eos]
    return seq[(seq != bos_token_id) & (seq != eos_token_id)]
