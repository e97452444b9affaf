"""MoE GPT + expert parallelism (lm/moe.py, parallel/ep.py) on the
8-virtual-device CPU mesh.

The reference LM is dense (no MoE anywhere in /root/reference/scripts/lm);
this is a framework extension for scaling new token LMs.  Invariants:

  * with identical experts, top-1 routing and no capacity drops, the MoE
    block IS the dense MLP (routing weights renormalize to 1);
  * the ("data", "expert") mesh forward matches the single-device forward;
  * the EP train step learns, carries the aux losses, and keeps expert
    leaves sharded over "expert";
  * KV-cached generation works with MoE layers (T=1 capacity path).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from protein_structure_tokenizer_tpu.lm import gpt, moe, sampling
from protein_structure_tokenizer_tpu.parallel import ep


def moe_cfg(**kw):
    base = dict(
        vocab_size=50,
        embed_dim=64,
        ffn_embed_dim=128,
        num_heads=4,
        num_layers=2,
        rope_dimensions=8,
        max_position_embeddings=24,
        num_experts=4,
        num_selected_experts=2,
    )
    base.update(kw)
    return gpt.GptConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = moe_cfg()
    params = gpt.init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 3, cfg.vocab_size)
    return cfg, params, ids


def test_moe_with_identical_experts_is_dense():
    """Top-1 routing + identical expert weights + no-drop capacity == the
    dense swiGLU MLP bit-for-bit (gates renormalize to exactly 1)."""
    cfg_dense = moe_cfg(num_experts=0)
    cfg_moe = moe_cfg(
        num_experts=4, num_selected_experts=1,
        expert_capacity_factor=4.0,  # C = T: nothing can drop
    )
    dense = gpt.init(jax.random.PRNGKey(3), cfg_dense)
    moe_params = gpt.init(jax.random.PRNGKey(3), cfg_moe)
    for i in range(cfg_moe.num_layers):
        base = f"gpt_decoder/gpt_decoder_layer_{i}/~"
        w = np.asarray(dense[f"{base}/fc1_linear_glu"]["w"])
        half = w.shape[1] // 2
        exp = moe_params[f"{base}/moe/experts"]
        e = cfg_moe.num_experts
        exp["w_gate"] = jnp.asarray(np.tile(w[None, :, :half], (e, 1, 1)))
        exp["w_value"] = jnp.asarray(np.tile(w[None, :, half:], (e, 1, 1)))
        exp["w2"] = jnp.asarray(
            np.tile(np.asarray(dense[f"{base}/fc2_linear"]["w"])[None], (e, 1, 1))
        )
        # Attention / norms / embeddings already agree: same init key and the
        # same split order per layer.
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 12), 3, cfg_dense.vocab_size)
    out_dense = gpt.forward(dense, cfg_dense, ids)["logits"]
    out_moe = gpt.forward(moe_params, cfg_moe, ids)["logits"]
    np.testing.assert_allclose(
        np.asarray(out_dense), np.asarray(out_moe), atol=1e-5
    )


def test_ep_forward_matches_single_device(setup):
    cfg, params, ids = setup
    ref = gpt.forward(params, cfg, ids)
    mesh = ep.make_ep_mesh(4)
    assert mesh.shape == {"data": 2, "expert": 4}
    ep_params = ep.shard_moe_params(params, mesh)
    exp = ep_params["gpt_decoder/gpt_decoder_layer_0/~/moe/experts"]
    assert exp["w2"].sharding.spec == P("expert", None, None)
    out = jax.jit(lambda p, t: gpt.forward(p, cfg, t, mesh=mesh))(ep_params, ids)
    np.testing.assert_allclose(
        np.asarray(ref["logits"]), np.asarray(out["logits"]), atol=1e-5
    )
    np.testing.assert_allclose(
        float(ref["moe_lb_loss"]), float(out["moe_lb_loss"]), rtol=1e-5
    )


def test_capacity_drops_tokens():
    """Tokens past an expert's capacity fall through (zero MoE contribution,
    the residual path carries them) — total combine mass < routed mass."""
    dims = moe.MoeDims(num_experts=2, num_selected=1, capacity=2)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 8, 16)) + 0.1  # positive features
    # Router that always picks expert 0 (positive row sums): only C=2 of the
    # 8 tokens get slots.
    p = {"w": jnp.concatenate([jnp.ones((16, 1)), -jnp.ones((16, 1))], axis=1)}
    dispatch, combine, lb, _ = moe.router(p, x, dims)
    assert float(dispatch.sum()) == 2.0  # capacity slots filled, rest dropped
    # Both slots belong to expert 0, in priority (sequence) order.
    assert float(dispatch[0, 0, 0, 0]) == 1.0
    assert float(dispatch[0, 1, 0, 1]) == 1.0
    assert float(dispatch[:, 2:].sum()) == 0.0


def test_ep_train_step_learns(setup):
    from protein_structure_tokenizer_tpu.runtime.train_lm import (
        LmTrainConfig,
        init_ep_train_state,
        make_train_step,
    )

    cfg, _, _ = setup
    mesh = ep.make_ep_mesh(4)
    tcfg = LmTrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=50)
    params, opt_state = init_ep_train_state(jax.random.PRNGKey(7), cfg, tcfg, mesh)
    step, _ = make_train_step(cfg, tcfg, mesh)
    tokens = jax.random.randint(jax.random.PRNGKey(8), (4, 17), 3, cfg.vocab_size)
    losses = []
    for _ in range(6):
        params, opt_state, m = step(params, opt_state, tokens)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
    assert np.isfinite(float(m["moe_lb_loss"]))
    # Expert moments stayed sharded through the updates (jit normalizes the
    # spec by dropping trailing Nones).
    exp = params["gpt_decoder/gpt_decoder_layer_0/~/moe/experts"]
    assert exp["w2"].sharding.spec[0] == "expert"


def test_moe_cached_generation(setup):
    cfg, params, _ = setup
    toks_cached = sampling.generate(
        params, cfg, jax.random.PRNGKey(9), batch_size=2, num_tokens=8
    )
    assert toks_cached.shape == (2, 8)
    assert np.isfinite(np.asarray(toks_cached)).all()


def test_moe_pp_rejected(setup):
    from protein_structure_tokenizer_tpu.parallel import pp

    cfg, _, _ = setup
    mesh = pp.make_pp_mesh(2)
    with pytest.raises(NotImplementedError):
        pp.make_pp_forward(cfg, mesh, num_microbatches=2)


def test_moe_layer_stride():
    cfg = moe_cfg(num_layers=4, moe_layer_stride=2)
    assert [cfg.is_moe_layer(i) for i in range(4)] == [False, True, False, True]
    params = gpt.init(jax.random.PRNGKey(0), cfg)
    assert "gpt_decoder/gpt_decoder_layer_1/~/moe/router" in params
    assert "gpt_decoder/gpt_decoder_layer_0/~/fc1_linear_glu" in params
    ids = jnp.zeros((2, 8), jnp.int32)
    out = gpt.forward(params, cfg, ids)
    assert np.isfinite(np.asarray(out["logits"])).all()
    assert "moe_lb_loss" in out


def test_pad_tokens_excluded_from_moe():
    """Pad positions claim no capacity and are excluded from the aux stats:
    appending pad tail to a batch leaves lb/z losses EXACTLY unchanged and
    the real positions' logits unchanged (no-drop capacity)."""
    cfg = moe_cfg(num_selected_experts=1, expert_capacity_factor=4.0)
    params = gpt.init(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 3, cfg.vocab_size)
    padded = jnp.concatenate(
        [ids, jnp.full((2, 6), cfg.pad_token_id, ids.dtype)], axis=1
    )
    out = gpt.forward(params, cfg, ids)
    out_p = gpt.forward(params, cfg, padded)
    np.testing.assert_allclose(
        float(out["moe_lb_loss"]), float(out_p["moe_lb_loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(out["moe_z_loss"]), float(out_p["moe_z_loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]),
        np.asarray(out_p["logits"][:, :8]),
        atol=1e-5,
    )


def test_moe_params_without_config_rejected():
    """Loading MoE weights with a dense config fails with a clear message,
    not a ZeroDivisionError deep in tracing."""
    cfg_moe = moe_cfg()
    params = gpt.init(jax.random.PRNGKey(0), cfg_moe)
    cfg_dense = moe_cfg(num_experts=0)
    with pytest.raises(ValueError, match="num_experts"):
        gpt.forward(params, cfg_dense, jnp.zeros((1, 4), jnp.int32))
