"""FSDP / ZeRO-3 LM training (parallel/fsdp.py) on the 8-virtual-device mesh.

The reference replicates all parameters under pmap
(inference_runner.py:236-248); FSDP is this framework's memory-scaling
alternative.  Invariants pinned here:

  * leaf_spec picks the largest divisible dim, replicates small/odd shapes;
  * the fully-sharded train step produces the SAME params and loss as the
    replicated data-parallel step (FSDP is a layout, not an algorithm);
  * params and Adam moments actually live sharded (per-device shard bytes
    shrink by the mesh factor) and stay sharded after the step.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from protein_structure_tokenizer_tpu.lm import gpt
from protein_structure_tokenizer_tpu.parallel import fsdp, mesh as mesh_lib
from protein_structure_tokenizer_tpu.runtime.train_lm import (
    LmTrainConfig,
    init_fsdp_train_state,
    init_train_state,
    make_train_step,
)


def small_cfg():
    return gpt.GptConfig(
        vocab_size=50,
        embed_dim=64,
        ffn_embed_dim=128,
        num_heads=4,
        num_layers=2,
        rope_dimensions=8,
        max_position_embeddings=24,
    )


def test_leaf_spec_rules():
    assert fsdp.leaf_spec((64, 128), 8, min_shard_elems=1) == P(None, "data")
    assert fsdp.leaf_spec((128, 64), 8, min_shard_elems=1) == P("data", None)
    # largest dim not divisible -> falls to the next divisible one
    assert fsdp.leaf_spec((129, 64), 8, min_shard_elems=1) == P(None, "data")
    # nothing divisible -> replicated
    assert fsdp.leaf_spec((7, 9), 8, min_shard_elems=1) == P()
    # scalars and small leaves replicated
    assert fsdp.leaf_spec((), 8) == P()
    assert fsdp.leaf_spec((64,), 8) == P()  # 64 < MIN_SHARD_ELEMS
    assert fsdp.leaf_spec((64,), 8, min_shard_elems=1) == P("data")


def test_fsdp_step_matches_data_parallel():
    cfg = small_cfg()
    tcfg = LmTrainConfig(warmup_steps=1, total_steps=10)
    mesh = mesh_lib.make_mesh()
    key = jax.random.PRNGKey(0)
    tokens = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (8, 3, 17), 3, cfg.vocab_size),
        dtype=np.int32,
    )

    dp_params, dp_opt = init_train_state(key, cfg, tcfg, mesh)
    dp_step, _ = make_train_step(cfg, tcfg, mesh)

    fs_params, fs_opt, fs_sh = init_fsdp_train_state(
        key, cfg, tcfg, mesh, min_shard_elems=1
    )
    fs_step, _ = make_train_step(cfg, tcfg, mesh, fsdp_state_shardings=fs_sh)

    n_shardable = fsdp.num_sharded_leaves(fs_params)
    assert n_shardable > 0

    losses = []
    for i in range(3):
        batch = mesh_lib.shard_batch(mesh, jnp.asarray(tokens[:, i]))
        dp_params, dp_opt, dp_m = dp_step(dp_params, dp_opt, batch)
        fs_params, fs_opt, fs_m = fs_step(fs_params, fs_opt, batch)
        losses.append((float(dp_m["loss"]), float(fs_m["loss"])))

    for dp_l, fs_l in losses:
        assert dp_l == pytest.approx(fs_l, rel=1e-5)
    # params identical after 3 updates (layout changes, numerics don't)
    flat_dp = jax.tree.leaves(jax.device_get(dp_params))
    flat_fs = jax.tree.leaves(jax.device_get(fs_params))
    for a, b in zip(flat_dp, flat_fs):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    # sharding survived the donated update
    assert fsdp.num_sharded_leaves(fs_params) == n_shardable


def test_fsdp_state_memory_is_sharded():
    cfg = small_cfg()
    tcfg = LmTrainConfig(warmup_steps=1, total_steps=10)
    mesh = mesh_lib.make_mesh()
    n = mesh.shape[mesh_lib.DATA_AXIS]
    params, opt_state, _ = init_fsdp_train_state(
        jax.random.PRNGKey(0), cfg, tcfg, mesh, min_shard_elems=1
    )

    def local_fraction(tree):
        total = sharded = 0
        for leaf in jax.tree.leaves(tree):
            if not isinstance(leaf, jax.Array) or leaf.ndim == 0:
                continue
            total += leaf.size
            shard = leaf.addressable_shards[0].data.size
            if shard * n == leaf.size:
                sharded += leaf.size
        return sharded / max(total, 1)

    # the bulk of parameter AND moment memory must be 1/n per device
    assert local_fraction(params) > 0.9
    assert local_fraction(opt_state) > 0.9


def test_fsdp_embedding_sharding_is_vocab_dim():
    """The (vocab, embed) table shards over its larger (vocab) axis when
    divisible; the released sizes (4099, 1024) shard the embed axis."""
    mesh = mesh_lib.make_mesh()
    spec = fsdp.leaf_spec((4099, 1024), mesh.shape[mesh_lib.DATA_AXIS])
    assert spec == P(None, "data")
