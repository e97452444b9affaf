"""GPT LM parity + KV-cache equivalence tests."""
import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.lm import gpt, sampling

SMALL = gpt.GptConfig(
    vocab_size=35,
    embed_dim=16,
    ffn_embed_dim=32,
    num_heads=2,
    num_layers=2,
    rope_dimensions=4,
    max_position_embeddings=18,
    bos_token_id=32,
    eos_token_id=33,
    pad_token_id=34,
)


def _ref_transform(cfg):
    from refmodel import import_reference

    import_reference()
    import haiku as hk
    from scripts.lm.gpt_model import GptConfig as RefConfig, build_gpt_fn

    ref_cfg = RefConfig(
        vocab_size=cfg.vocab_size,
        eos_token_id=cfg.eos_token_id,
        embed_dim=cfg.embed_dim,
        ffn_embed_dim=cfg.ffn_embed_dim,
        num_heads=cfg.num_heads,
        num_layers=cfg.num_layers,
        rope_dimensions=cfg.rope_dimensions,
        max_position_embeddings=cfg.max_position_embeddings,
        add_bias_ffn=False,
        ffn_activation_name="swish",
        use_glu_in_ffn=True,
        add_bias_lm_head=False,
        use_gradient_checkpointing=False,
        norm_type="layer_norm",
        parallel_attention_ff=False,
        dropout_rate=0.0,
    )
    return hk.transform(build_gpt_fn(ref_cfg))


@requires_reference
def test_forward_logits_parity():
    f = _ref_transform(SMALL)
    key = jax.random.PRNGKey(0)
    tokens = jnp.asarray(
        np.random.RandomState(0).randint(0, SMALL.vocab_size, size=(2, 18)), jnp.int32
    )
    params = f.init(key, tokens)
    ref_out = f.apply(params, key, tokens)
    ours = gpt.forward(params, SMALL, tokens)
    np.testing.assert_allclose(
        np.asarray(ours["logits"]), np.asarray(ref_out["logits"]), atol=1e-5
    )


def test_param_tree_shapes():
    params = gpt.init(jax.random.PRNGKey(0), SMALL)
    tokens = jnp.zeros((1, 4), jnp.int32)
    out = gpt.forward(params, SMALL, tokens)
    assert out["logits"].shape == (1, 4, SMALL.vocab_size)


def test_cache_matches_full_forward():
    params = gpt.init(jax.random.PRNGKey(1), SMALL)
    rng = np.random.RandomState(1)
    seq = jnp.asarray(rng.randint(0, SMALL.vocab_size, size=(2, 10)), jnp.int32)

    full_logits = gpt.forward(params, SMALL, seq)["logits"]

    cache = gpt.init_kv_cache(SMALL, 2, 10)
    step_logits = []
    for t in range(10):
        logits, cache = gpt.forward_step(
            params, SMALL, seq[:, t : t + 1], cache, jnp.asarray(t)
        )
        step_logits.append(np.asarray(logits))
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full_logits), atol=1e-5)


@pytest.mark.parametrize("method,kwargs", [
    ("temperature", {"temperature": 0.6}),
    ("top_k", {"k": 4, "temperature": 0.6}),
    ("top_p", {"top_p": 0.5, "temperature": 0.6}),
])
def test_cached_generation_matches_uncached(method, kwargs):
    params = gpt.init(jax.random.PRNGKey(2), SMALL)
    key = jax.random.PRNGKey(3)
    fast = sampling.generate(
        params, SMALL, key, batch_size=2, num_tokens=12, method=method,
        use_cache=True, **kwargs,
    )
    slow = sampling.generate(
        params, SMALL, key, batch_size=2, num_tokens=12, method=method,
        use_cache=False, **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


@requires_reference
def test_generation_matches_reference_sampler():
    """Our uncached generation must replicate the reference's sampling loop
    token-for-token given the same parameters and PRNG key."""
    from scripts.lm.generation_utils import update_tokens_ids_temperature_sampling

    f = _ref_transform(SMALL)
    key = jax.random.PRNGKey(0)
    block = 12
    tokens0 = jnp.full((2, block), SMALL.bos_token_id, jnp.int32)
    params = f.init(key, tokens0)

    ref_tokens = tokens0
    ref_key = jax.random.PRNGKey(7)
    for i in range(block):
        ref_tokens, ref_key = update_tokens_ids_temperature_sampling(
            tokens_ids=ref_tokens,
            time_step=jnp.asarray(i),
            random_key=ref_key,
            params=params,
            apply_fn=f.apply,
            temperature=0.6,
        )

    ours = sampling.generate(
        params, SMALL, jax.random.PRNGKey(7), batch_size=2, num_tokens=block,
        method="temperature", temperature=0.6, use_cache=False,
    )
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref_tokens))

    fast = sampling.generate(
        params, SMALL, jax.random.PRNGKey(7), batch_size=2, num_tokens=block,
        method="temperature", temperature=0.6, use_cache=True,
    )
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref_tokens))


def test_fused_qkv_matches_separate():
    """fuse_qkv_params folds q/k/v projections into one matmul; logits are
    the same contraction per output column, so forward outputs match to
    accumulation-order rounding and generation still emits valid tokens."""
    params = gpt.init(jax.random.PRNGKey(6), SMALL)
    fused = gpt.fuse_qkv_params(params, SMALL)
    assert not any("query_linear" in s for s in fused)
    rng = np.random.RandomState(5)
    seq = jnp.asarray(rng.randint(0, SMALL.vocab_size, size=(2, 9)), jnp.int32)
    a = gpt.forward(params, SMALL, seq)["logits"]
    b = gpt.forward(fused, SMALL, seq)["logits"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    toks = sampling.generate(
        fused, SMALL, jax.random.PRNGKey(1), batch_size=2, num_tokens=8,
        cache_segment=4,
    )
    assert ((np.asarray(toks) >= 0) & (np.asarray(toks) < SMALL.vocab_size)).all()


def test_segmented_cache_matches_full_cache():
    """cache_segment grows the KV cache in chunks; sampled tokens must match
    the full-cache engine (identical masked math — only the count of fully-
    masked padded positions per reduction differs)."""
    params = gpt.init(jax.random.PRNGKey(2), SMALL)
    key = jax.random.PRNGKey(9)
    full = sampling.generate(
        params, SMALL, key, batch_size=3, num_tokens=16,
        method="temperature", temperature=0.7,
    )
    for seg in (4, 5, 16, 64):
        seg_out = sampling.generate(
            params, SMALL, key, batch_size=3, num_tokens=16,
            method="temperature", temperature=0.7, cache_segment=seg,
        )
        np.testing.assert_array_equal(np.asarray(seg_out), np.asarray(full))


def test_bf16_generation_distribution_equivalence():
    """The fast generate path (bf16 params + bf16 KV cache, f32
    softmax/LN/logits islands) must sample from (numerically) the same
    distribution as f32: samplers see f32 logits whose per-position softmax
    stays within a small KL of the f32 model's, and the cached step logits
    track the full bf16 forward."""
    from protein_structure_tokenizer_tpu.runtime.precision import cast_floats

    params = gpt.init(jax.random.PRNGKey(4), SMALL)
    params16 = cast_floats(params, jnp.bfloat16)
    rng = np.random.RandomState(3)
    seq = jnp.asarray(rng.randint(0, SMALL.vocab_size, size=(2, 10)), jnp.int32)

    l32 = np.asarray(gpt.forward(params, SMALL, seq)["logits"], np.float64)
    out16 = gpt.forward(params16, SMALL, seq)["logits"]
    assert out16.dtype == jnp.float32  # the lm-head island always emits f32
    l16 = np.asarray(out16, np.float64)

    def log_softmax(z):
        z = z - z.max(axis=-1, keepdims=True)
        return z - np.log(np.exp(z).sum(axis=-1, keepdims=True))

    lp, lq = log_softmax(l32), log_softmax(l16)
    kl = (np.exp(lp) * (lp - lq)).sum(axis=-1)
    assert kl.max() < 5e-3, f"bf16 sampling distribution drifted: KL={kl.max()}"

    # KV-cached bf16 steps match the full bf16 forward (bf16 cache engaged).
    cache = gpt.init_kv_cache(SMALL, 2, 10, dtype=jnp.bfloat16)
    assert cache[0]["k"].dtype == jnp.bfloat16
    step_logits = []
    for t in range(10):
        logits, cache = gpt.forward_step(
            params16, SMALL, seq[:, t : t + 1], cache, jnp.asarray(t)
        )
        step_logits.append(np.asarray(logits))
    np.testing.assert_allclose(
        np.stack(step_logits, axis=1), l16.astype(np.float32),
        atol=5e-2, rtol=0,
    )

    # End-to-end generation with bf16 params emits only valid token ids.
    toks = np.asarray(
        sampling.generate(
            params16, SMALL, jax.random.PRNGKey(5), batch_size=2,
            num_tokens=12, method="temperature", temperature=0.8,
        )
    )
    assert toks.shape == (2, 12)
    assert ((toks >= 0) & (toks < SMALL.vocab_size)).all()


def test_strip_special_tokens():
    seq = np.array([32, 5, 7, 33, 9, 33])
    out = sampling.strip_special_tokens(seq, 32, 33)
    np.testing.assert_array_equal(out, [5, 7])


def test_stop_at_eos_matches_full_block():
    """Early-exit generation: stripped sequences identical to the full-block
    run (pre-EOS prefixes sample the same RNG stream), and the loop may stop
    well before num_tokens."""
    cfg = SMALL
    params = gpt.init(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(7)

    full = sampling.generate(
        params, cfg, key, batch_size=4, num_tokens=24, method="temperature",
        temperature=2.0,
    )
    early = sampling.generate(
        params, cfg, key, batch_size=4, num_tokens=24, method="temperature",
        temperature=2.0, stop_at_eos=True,
    )
    got_eos = False
    for row in range(4):
        a = sampling.strip_special_tokens(
            np.asarray(full)[row], cfg.bos_token_id, cfg.eos_token_id
        )
        b = sampling.strip_special_tokens(
            np.asarray(early)[row], cfg.bos_token_id, cfg.eos_token_id
        )
        np.testing.assert_array_equal(a, b)
        got_eos |= (np.asarray(full)[row, 1:] == cfg.eos_token_id).any()
    assert got_eos  # the tiny random model must actually emit EOS somewhere

    with pytest.raises(ValueError, match="stop_at_eos"):
        sampling.generate(
            params, cfg, key, batch_size=1, num_tokens=8,
            use_cache=False, stop_at_eos=True,
        )


def test_int8_weight_only_quantization():
    """The int8 serving path (lm.quant): per-output-channel symmetric int8
    weights for the per-layer matmuls, everything else untouched.  Round-trip
    error is bounded by half a quantization step per weight; logits stay
    within a small KL of the f32 model; generation emits valid ids and the
    KV cache keeps the bf16 dtype (the f32 scales must not decide it)."""
    from protein_structure_tokenizer_tpu.lm import quant
    from protein_structure_tokenizer_tpu.runtime.precision import cast_floats

    params = gpt.init(jax.random.PRNGKey(7), SMALL)
    qparams = quant.quantize_gpt_params_int8(params)

    # Layout: the matmul leaves carry int8 + f32 scales; embeddings, norms
    # and the head pass through unchanged.
    n_quant = sum("w_int8" in leaves for leaves in qparams.values())
    assert n_quant == SMALL.num_layers * 6  # q/k/v/out + glu + fc2 per layer
    assert "w" in qparams["gpt_decoder/~/simple_lm_head/~/lm_final_fc"]
    for leaves in qparams.values():
        if "w_int8" in leaves:
            assert leaves["w_int8"].dtype == jnp.int8
            assert leaves["w_scale"].dtype == jnp.float32

    # Round trip: per-element error <= scale/2 (half a quantization step).
    deq = quant.dequantize_gpt_params(qparams)
    for scope, leaves in params.items():
        if "w_int8" not in qparams[scope]:
            continue
        err = np.abs(np.asarray(deq[scope]["w"]) - np.asarray(leaves["w"]))
        step = np.asarray(qparams[scope]["w_scale"])[None, :]
        assert (err <= 0.5 * step + 1e-7).all(), scope

    # Distribution: int8 logits track f32 logits within a small KL.
    rng = np.random.RandomState(11)
    seq = jnp.asarray(rng.randint(0, SMALL.vocab_size, size=(2, 10)), jnp.int32)
    l32 = np.asarray(gpt.forward(params, SMALL, seq)["logits"], np.float64)
    q16 = quant.quantize_gpt_params_int8(
        gpt.fuse_qkv_params(cast_floats(params, jnp.bfloat16), SMALL)
    )
    l8 = np.asarray(gpt.forward(q16, SMALL, seq)["logits"], np.float64)

    def log_softmax(z):
        z = z - z.max(axis=-1, keepdims=True)
        return z - np.log(np.exp(z).sum(axis=-1, keepdims=True))

    lp, lq = log_softmax(l32), log_softmax(l8)
    kl = (np.exp(lp) * (lp - lq)).sum(axis=-1)
    assert kl.max() < 3e-2, f"int8 sampling distribution drifted: KL={kl.max()}"

    # Cache dtype follows the embedding dtype (bf16), not the f32 scales,
    # and end-to-end generation emits only valid token ids.
    toks = np.asarray(
        sampling.generate(
            q16, SMALL, jax.random.PRNGKey(5), batch_size=2,
            num_tokens=12, method="top_k", k=4, temperature=0.8,
        )
    )
    assert toks.shape == (2, 12)
    assert ((toks >= 0) & (toks < SMALL.vocab_size)).all()


def test_int8_kv_cache():
    """int8 KV cache: per-(batch, position, head) scales fold into the
    attention matmuls.  Step logits track the f32-cache step logits; the
    segmented-growth path pads the 3-D scale buffers correctly; generation
    emits valid ids."""
    params = gpt.init(jax.random.PRNGKey(9), SMALL)
    rng = np.random.RandomState(13)
    seq = jnp.asarray(rng.randint(0, SMALL.vocab_size, size=(2, 10)), jnp.int32)

    def run_steps(int8):
        cache = gpt.init_kv_cache(SMALL, 2, 10, int8=int8)
        out = []
        for t in range(10):
            logits, cache = gpt.forward_step(
                params, SMALL, seq[:, t : t + 1], cache, jnp.asarray(t)
            )
            out.append(np.asarray(logits))
        return np.stack(out, axis=1), cache

    ref, _ = run_steps(False)
    got, cache = run_steps(True)
    assert cache[0]["k"].dtype == jnp.int8
    assert cache[0]["k_scale"].shape == (2, 10, SMALL.num_heads)
    # per-vector int8 rounding is ~0.4% relative; logits are O(1) here
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0)

    # softmax weights stay normalized-ish: probabilities from the two paths
    # agree to a small KL
    def log_softmax(z):
        z = z - z.max(axis=-1, keepdims=True)
        return z - np.log(np.exp(z).sum(axis=-1, keepdims=True))

    lp, lq = log_softmax(ref.astype(np.float64)), log_softmax(got.astype(np.float64))
    kl = (np.exp(lp) * (lp - lq)).sum(axis=-1)
    assert kl.max() < 3e-2, f"int8 KV drifted: KL={kl.max()}"

    # segmented growth (pads int8 buffers AND 3-D scales) + generation
    toks = np.asarray(
        sampling.generate(
            params, SMALL, jax.random.PRNGKey(5), batch_size=2,
            num_tokens=12, method="temperature", temperature=0.8,
            cache_segment=5, int8_kv=True,
        )
    )
    assert toks.shape == (2, 12)
    assert ((toks >= 0) & (toks < SMALL.vocab_size)).all()


def test_prompted_generation():
    """Prefix-conditioned sampling: the forced BOS+prompt prefix survives in
    the output, cached == uncached token-identical, the segmented and
    stop_at_eos engines agree on the prefix, and the prefill block's logits
    equal per-token stepping."""
    params = gpt.init(jax.random.PRNGKey(2), SMALL)
    rng = np.random.RandomState(21)
    prompt = jnp.asarray(rng.randint(0, 32, size=(2, 5)), jnp.int32)
    key = jax.random.PRNGKey(11)

    cached = np.asarray(sampling.generate(
        params, SMALL, key, batch_size=2, num_tokens=14,
        method="temperature", temperature=0.7, prompt=prompt,
    ))
    # forced prefix: BOS then the prompt tokens
    assert (cached[:, 0] == SMALL.bos_token_id).all()
    np.testing.assert_array_equal(cached[:, 1:6], np.asarray(prompt))

    uncached = np.asarray(sampling.generate(
        params, SMALL, key, batch_size=2, num_tokens=14,
        method="temperature", temperature=0.7, prompt=prompt, use_cache=False,
    ))
    np.testing.assert_array_equal(cached, uncached)

    segmented = np.asarray(sampling.generate(
        params, SMALL, key, batch_size=2, num_tokens=14,
        method="temperature", temperature=0.7, prompt=prompt, cache_segment=4,
    ))
    np.testing.assert_array_equal(cached, segmented)

    eos = np.asarray(sampling.generate(
        params, SMALL, key, batch_size=2, num_tokens=14,
        method="temperature", temperature=0.7, prompt=prompt, stop_at_eos=True,
    ))
    np.testing.assert_array_equal(eos[:, :6], cached[:, :6])

    # Prefill logits == one-token-at-a-time stepping through the prefix.
    forced = np.concatenate(
        [np.full((2, 1), SMALL.bos_token_id, np.int32), np.asarray(prompt)], axis=1
    )
    cache_a = gpt.init_kv_cache(SMALL, 2, 6)
    logits_a, _ = gpt.forward_step(
        params, SMALL, jnp.asarray(forced), cache_a, jnp.int32(0)
    )
    cache_b = gpt.init_kv_cache(SMALL, 2, 6)
    for t in range(6):
        logits_b, cache_b = gpt.forward_step(
            params, SMALL, jnp.asarray(forced[:, t : t + 1]), cache_b, jnp.asarray(t)
        )
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_b), atol=2e-5, rtol=0
    )

    # Validation errors
    with pytest.raises(ValueError):
        sampling.generate(params, SMALL, key, batch_size=2, num_tokens=5,
                          prompt=jnp.zeros((2, 6), jnp.int32))
    with pytest.raises(ValueError):
        sampling.generate(params, SMALL, key, batch_size=2, num_tokens=14,
                          prompt=jnp.zeros((3, 2), jnp.int32))


def test_prompted_int8_segmented_combination():
    """All serving options composed: prompt prefill + int8 KV cache +
    segmented growth + int8 weights — prefix preserved, ids valid."""
    from protein_structure_tokenizer_tpu.lm import quant
    from protein_structure_tokenizer_tpu.runtime.precision import cast_floats

    params = quant.quantize_gpt_params_int8(
        gpt.fuse_qkv_params(
            cast_floats(gpt.init(jax.random.PRNGKey(3), SMALL), jnp.bfloat16),
            SMALL,
        )
    )
    prompt = jnp.asarray([[3, 30, 12], [8, 1, 25]], jnp.int32)
    toks = np.asarray(sampling.generate(
        params, SMALL, jax.random.PRNGKey(6), batch_size=2, num_tokens=15,
        method="temperature", temperature=0.9, prompt=prompt,
        cache_segment=4, int8_kv=True,
    ))
    assert (toks[:, 0] == SMALL.bos_token_id).all()
    np.testing.assert_array_equal(toks[:, 1:4], np.asarray(prompt))
    assert ((toks >= 0) & (toks < SMALL.vocab_size)).all()
