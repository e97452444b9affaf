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
