"""GPT tensor parallelism (parallel/tp.py) on the 8-virtual-device CPU mesh.

The 2-D Mesh(("data", "model")) splits each transformer block Megatron-style
(qkv/fc1 column-sharded, out/fc2 row-sharded).  These tests assert the sharded
forward is numerically the single-device forward, for both the full forward
and the KV-cached incremental step.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from protein_structure_tokenizer_tpu.lm import gpt
from protein_structure_tokenizer_tpu.parallel import tp


def tiny_cfg():
    return gpt.GptConfig(
        vocab_size=50,
        embed_dim=64,
        ffn_embed_dim=128,
        num_heads=4,
        num_layers=2,
        rope_dimensions=8,
        max_position_embeddings=24,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = gpt.init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab_size)
    return cfg, params, ids


def test_tp_forward_matches_single_device(setup):
    cfg, params, ids = setup
    ref = gpt.forward(params, cfg, ids)["logits"]

    mesh = tp.make_2d_mesh(2)
    assert mesh.shape == {"data": 4, "model": 2}
    tp_params = tp.shard_gpt_params(params, mesh)
    # GLU weight was split into evenly-shardable halves.
    glu = tp_params["gpt_decoder/gpt_decoder_layer_0/~/fc1_linear_glu"]
    assert set(glu) == {"w_gate", "w_value"}
    assert glu["w_gate"].sharding.spec == P(None, "model")

    ids_sharded = jax.device_put(ids, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda p, t: gpt.forward(p, cfg, t, mesh=mesh)["logits"])(
        tp_params, ids_sharded
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_tp_cached_step_matches_single_device(setup):
    cfg, params, ids = setup
    mesh = tp.make_2d_mesh(2)
    tp_params = tp.shard_gpt_params(params, mesh)
    batch = ids.shape[0]
    max_len = 16

    # Reference: cached decoding on one device.
    cache_ref = gpt.init_kv_cache(cfg, batch, max_len)
    step_ref = jax.jit(
        lambda p, t, c, i: gpt.forward_step(p, cfg, t, c, i)
    )
    # Tensor-parallel: same steps on the 2-D mesh.
    cache_tp = gpt.init_kv_cache(cfg, batch, max_len, mesh=mesh)
    step_tp = jax.jit(
        lambda p, t, c, i: gpt.forward_step(p, cfg, t, c, i, mesh=mesh)
    )

    ids_sharded = jax.device_put(ids, NamedSharding(mesh, P("data")))
    for t in range(4):
        tok = ids[:, t : t + 1]
        tok_sh = ids_sharded[:, t : t + 1]
        logits_ref, cache_ref = step_ref(params, tok, cache_ref, jnp.int32(t))
        logits_tp, cache_tp = step_tp(tp_params, tok_sh, cache_tp, jnp.int32(t))
        np.testing.assert_allclose(
            np.asarray(logits_tp), np.asarray(logits_ref), atol=2e-5
        )


def test_tp_noop_without_model_axis(setup):
    """mesh=None (the default everywhere else) must be bit-identical to the
    pre-tp code path."""
    cfg, params, ids = setup
    a = gpt.forward(params, cfg, ids, mesh=None)["logits"]
    b = gpt.forward(params, cfg, ids)["logits"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tp_sequence_parallel_matches(setup):
    """Megatron-SP: T-sharded residual stream between blocks is numerically
    the single-device forward, and the stream actually lands T-sharded."""
    cfg, params, ids = setup
    ref = gpt.forward(params, cfg, ids)["logits"]

    mesh = tp.make_2d_mesh(2)
    tp_params = tp.shard_gpt_params(params, mesh)
    ids_sharded = jax.device_put(ids, NamedSharding(mesh, P("data")))
    out = jax.jit(
        lambda p, t: gpt.forward(
            p, cfg, t, mesh=mesh, sequence_parallel=True
        )["embeddings"]
    )(tp_params, ids_sharded)
    logits = jax.jit(
        lambda p, t: gpt.forward(
            p, cfg, t, mesh=mesh, sequence_parallel=True
        )["logits"]
    )(tp_params, ids_sharded)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=2e-5)
    # The residual stream (embeddings output) is T-sharded over "model".
    spec = out.sharding.spec
    assert "model" in str(spec), spec


def test_tp_sp_train_step_and_export(tmp_path):
    """Tensor+sequence-parallel LM training end-to-end via the CLI: loss
    finite, exported params re-fused (GLU) and consumable by the plain
    forward."""
    import joblib

    from protein_structure_tokenizer_tpu.cli import train_lm as cli

    tokens_dir = tmp_path / "tokens"
    tokens_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(8):
        np.save(tokens_dir / f"s{i}_tokens.npy", rng.randint(0, 16, size=6))

    export = tmp_path / "params.joblib"
    cli.main([
        "--tokens_dir", str(tokens_dir),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--codebook_size", "432",
        "--num_steps", "3",
        "--batch_size_per_device", "1",
        "--num_layers", "2",
        "--embed_dim", "32",
        "--num_heads", "4",
        "--block_size", "16",
        "--tensor_parallel", "2",
        "--sequence_parallel",
        "--export_params", str(export),
    ])
    params = joblib.load(export)
    import dataclasses

    cfg = dataclasses.replace(
        gpt.released_gpt_config(432),
        num_layers=2, embed_dim=32, ffn_embed_dim=128, num_heads=4,
        max_position_embeddings=16,
    )
    glu = params["gpt_decoder/gpt_decoder_layer_0/~/fc1_linear_glu"]
    assert set(glu) == {"w"} and glu["w"].shape == (32, 256)
    logits = gpt.forward(params, cfg, jnp.zeros((2, 8), jnp.int32))["logits"]
    assert np.isfinite(np.asarray(logits)).all()
