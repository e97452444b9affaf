"""GPT LM training: loss/masking, train step on the CPU mesh, dataset packing."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.lm import gpt
from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
from protein_structure_tokenizer_tpu.runtime.train_lm import (
    LmTrainConfig,
    TokenSequenceDataset,
    init_train_state,
    lm_loss,
    make_train_step,
    pack_sequence,
)

TINY = gpt.GptConfig(
    vocab_size=19,
    embed_dim=32,
    ffn_embed_dim=64,
    num_heads=4,
    num_layers=2,
    rope_dimensions=4,
    max_position_embeddings=24,
    bos_token_id=16,
    eos_token_id=17,
    pad_token_id=18,
)


def test_pack_sequence():
    seq = pack_sequence(np.arange(5), TINY)
    assert seq.shape == (24,)
    assert seq[0] == TINY.bos_token_id
    np.testing.assert_array_equal(seq[1:6], np.arange(5))
    assert seq[6] == TINY.eos_token_id
    assert (seq[7:] == TINY.pad_token_id).all()
    # Over-long sequences truncate to block - 2 (room for bos/eos).
    long = pack_sequence(np.arange(100) % 16, TINY)
    assert long[0] == TINY.bos_token_id and long[-1] == TINY.eos_token_id
    assert long.shape == (24,)


def test_dataset_from_dir(tmp_path):
    for i in range(5):
        np.save(tmp_path / f"s{i}_tokens.npy", np.arange(4 + i) % 16)
    ds = TokenSequenceDataset.from_dir(str(tmp_path), TINY)
    assert len(ds) == 5
    batch = next(ds.batches(global_batch=4))
    assert batch.shape == (4, 24)
    # Determinism across resume.
    b1 = next(ds.batches(global_batch=4, start_step=1))
    stream = ds.batches(global_batch=4)
    next(stream)
    np.testing.assert_array_equal(next(stream), b1)


def test_lm_loss_masks_pad():
    key = jax.random.PRNGKey(0)
    params = gpt.init(key, TINY)
    cfg = LmTrainConfig()
    tokens = jnp.asarray(np.stack([pack_sequence(np.arange(6) % 16, TINY)] * 2))
    loss, metrics = lm_loss(params, TINY, cfg, tokens)
    assert np.isfinite(float(loss))
    # Only bos..eos transitions count: 7 targets per row (5 tokens + eos + 1).
    assert float(metrics["tokens"]) == 2 * 7
    # Pad-tail length must not matter: the same content packed into a shorter
    # block yields the same mean loss (pad targets contribute nothing, and
    # causal attention keeps pad inputs out of unmasked positions' logits).
    short = jnp.asarray(
        np.stack([pack_sequence(np.arange(6) % 16, TINY, block_size=10)] * 2)
    )
    loss2, metrics2 = lm_loss(params, TINY, cfg, short)
    assert float(metrics2["tokens"]) == float(metrics["tokens"])
    assert float(loss2) == pytest.approx(float(loss), rel=1e-5)


def test_train_step_reduces_loss():
    mesh = mesh_lib.make_mesh()
    cfg = LmTrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=40)
    key = jax.random.PRNGKey(1)
    params, opt_state = init_train_state(key, TINY, cfg, mesh)
    train_step, _ = make_train_step(TINY, cfg, mesh)

    rng = np.random.RandomState(0)
    seqs = np.stack([pack_sequence(rng.randint(0, 4, size=8), TINY) for _ in range(8)])
    tokens = mesh_lib.shard_batch(mesh, jnp.asarray(seqs))

    losses = []
    for _ in range(30):
        params, opt_state, metrics = train_step(params, opt_state, tokens)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


def test_trained_params_generate():
    """Params out of the train step drive the KV-cached sampler."""
    from protein_structure_tokenizer_tpu.lm import sampling

    mesh = mesh_lib.make_mesh()
    cfg = LmTrainConfig(total_steps=5)
    key = jax.random.PRNGKey(2)
    params, opt_state = init_train_state(key, TINY, cfg, mesh)
    train_step, _ = make_train_step(TINY, cfg, mesh)
    rng = np.random.RandomState(1)
    seqs = np.stack([pack_sequence(rng.randint(0, 16, size=6), TINY) for _ in range(8)])
    params, _, _ = train_step(params, opt_state, mesh_lib.shard_batch(mesh, jnp.asarray(seqs)))

    out = sampling.generate(
        params, TINY, jax.random.PRNGKey(3), batch_size=2,
        num_tokens=TINY.max_position_embeddings, method="temperature",
        temperature=1.0,
    )
    out = np.asarray(out)
    assert out.shape == (2, TINY.max_position_embeddings)
    assert (out[:, 0] == TINY.bos_token_id).all()
    assert ((out >= 0) & (out < TINY.vocab_size)).all()


def test_grad_accumulation_matches_full_batch():
    """grad_accum_steps=2 over two half-batches == one full-batch update
    (MultiSteps averages the micro-grads; adam sees identical moments)."""
    import dataclasses

    import jax
    import numpy as np

    from protein_structure_tokenizer_tpu.lm import gpt
    from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
    from protein_structure_tokenizer_tpu.runtime.train_lm import (
        LmTrainConfig,
        init_train_state,
        make_train_step,
    )

    cfg = gpt.GptConfig(
        vocab_size=40, embed_dim=32, ffn_embed_dim=64, num_heads=4,
        num_layers=2, rope_dimensions=8, max_position_embeddings=12,
    )
    base = LmTrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    mesh = mesh_lib.make_mesh()
    tokens = jax.random.randint(jax.random.PRNGKey(0), (16, 9), 3, cfg.vocab_size)

    # Full batch, no accumulation.
    p1, o1 = init_train_state(jax.random.PRNGKey(1), cfg, base, mesh)
    step1, _ = make_train_step(cfg, base, mesh)
    p1, o1, _ = step1(p1, o1, tokens)

    # Two micro-steps of 8 rows with k=2.
    acc = dataclasses.replace(base, grad_accum_steps=2)
    p2, o2 = init_train_state(jax.random.PRNGKey(1), cfg, acc, mesh)
    step2, _ = make_train_step(cfg, acc, mesh)
    p2, o2, _ = step2(p2, o2, tokens[:8])
    p2, o2, _ = step2(p2, o2, tokens[8:])

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        jax.device_get(p1),
        jax.device_get(p2),
    )
