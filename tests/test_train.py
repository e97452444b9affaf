"""Training stack: dataset streaming, sharded train step, checkpoint resume.

The reference ships losses but no optimizer/driver (SURVEY.md §3.4) — these
tests cover the from-scratch training capability this framework adds, on the
8-virtual-device CPU mesh.
"""
import dataclasses
import glob

import numpy as np
import pytest

import jax

from protein_structure_tokenizer_tpu.data.featurize import FeaturizeConfig, preprocess_sample
from protein_structure_tokenizer_tpu.data.pipeline import DataPipeline
from protein_structure_tokenizer_tpu.data.sample import ProteinSample
from protein_structure_tokenizer_tpu.data.types import TokenizerBatch
from protein_structure_tokenizer_tpu.models.config import tiny_preset
from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
from protein_structure_tokenizer_tpu.runtime.dataset import DatasetConfig, StructureDataset
from protein_structure_tokenizer_tpu.runtime.train import (
    TrainConfig,
    init_train_state,
    make_train_step,
)
from protein_structure_tokenizer_tpu.runtime.train_checkpoint import TrainCheckpointManager

SEQ_MAX, K, DF = 16, 4, 2


def synthetic_sample(n_res: int, seed: int) -> ProteinSample:
    """An idealized helix backbone (N/CA/C/O per residue, 21-way aatype)."""
    rng = np.random.RandomState(seed)
    t = np.arange(n_res, dtype=np.float64)
    ca = np.stack(
        [2.3 * np.cos(t * 1.75), 2.3 * np.sin(t * 1.75), 1.5 * t], axis=-1
    )
    ca += rng.randn(n_res, 3) * 0.05
    # Fixed local offsets keep N/CA/C non-collinear so frames are well-defined.
    n_xyz = ca + np.array([1.2, 0.4, -0.5])
    c_xyz = ca + np.array([-0.8, 1.0, 0.6])
    o_xyz = c_xyz + np.array([0.3, -0.9, 0.7])

    from protein_structure_tokenizer_tpu.data import constants

    pos = np.zeros((n_res, 37, 3))
    exists = np.zeros((n_res, 37), dtype=bool)
    for idx, xyz in [
        (constants.N_INDEX, n_xyz),
        (constants.CA_INDEX, ca),
        (constants.C_INDEX, c_xyz),
        (constants.O_INDEX, o_xyz),
    ]:
        pos[:, idx] = xyz
        exists[:, idx] = True
    aatype = np.eye(21, dtype=np.float32)[rng.randint(0, 20, size=n_res)]
    return ProteinSample(
        chain_id="A",
        nb_residues=n_res,
        aatype=aatype,
        atom37_positions=pos,
        atom37_gt_exists=exists,
        atom37_atom_exists=exists,
    )


def featurize_config() -> FeaturizeConfig:
    return FeaturizeConfig(
        num_neighbor=K,
        downsampling_ratio=DF,
        padding_num_residue=SEQ_MAX,
        crop_index=SEQ_MAX,
    )


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    """Mixed corpus: preprocessed .npz for even ids, raw .pdb-free path via npz
    only (PDB writing is covered elsewhere)."""
    d = tmp_path_factory.mktemp("train_corpus")
    pipe = DataPipeline()
    for i in range(6):
        sample = synthetic_sample(10 + (i % 3) * 2, seed=i)
        graph, feats = preprocess_sample(sample, featurize_config())
        pipe.save(graph, feats, str(d / f"sample_{i}.npz"))
    return str(d)


def test_dataset_streams_batches(corpus_dir):
    ds = StructureDataset.from_dir(corpus_dir, DatasetConfig(featurize=featurize_config()))
    assert len(ds) == 6
    stream = ds.batches(global_batch=4)
    batch = next(stream)
    assert isinstance(batch, TokenizerBatch)
    assert batch.graph.nodes_mask.shape == (4, SEQ_MAX, 1)
    assert batch.features["atom14_gt_positions"].shape == (4, SEQ_MAX, 14, 3)
    assert batch.features["backbone_affine_tensor"].shape == (4, SEQ_MAX, 7)
    # Deterministic reconstruction from (seed, step): fast-forward matches.
    b0 = next(stream)
    stream2 = ds.batches(global_batch=4, start_step=1)
    b1 = next(stream2)
    np.testing.assert_array_equal(
        np.asarray(b0.graph.nodes_original_coordinates),
        np.asarray(b1.graph.nodes_original_coordinates),
    )


def test_dataset_local_slice(corpus_dir):
    ds = StructureDataset.from_dir(corpus_dir, DatasetConfig(featurize=featurize_config()))
    full = next(ds.batches(global_batch=4))
    half = next(ds.batches(global_batch=4, local=slice(2, 4)))
    np.testing.assert_array_equal(
        np.asarray(full.graph.nodes_original_coordinates[2:4]),
        np.asarray(half.graph.nodes_original_coordinates),
    )


@pytest.mark.slow
def test_train_steps_reduce_loss(corpus_dir):
    cfg = tiny_preset(seq_max=SEQ_MAX, k=K, downsampling=DF, dim=16)
    train_cfg = TrainConfig(learning_rate=3e-4)
    mesh = mesh_lib.make_mesh()
    key = jax.random.PRNGKey(0)
    params, opt_state = init_train_state(key, cfg, train_cfg, mesh)
    train_step, _ = make_train_step(cfg, train_cfg, mesh)

    ds = StructureDataset.from_dir(corpus_dir, DatasetConfig(featurize=featurize_config()))
    stream = ds.batches(global_batch=8)

    losses = []
    for _ in range(8):
        batch = mesh_lib.shard_batch(mesh, next(stream))
        key, sk = jax.random.split(key)
        params, opt_state, metrics = train_step(params, opt_state, batch, sk)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses  # the optimizer is actually learning


@pytest.mark.slow
def test_checkpoint_save_restore_roundtrip(corpus_dir, tmp_path):
    cfg = tiny_preset(seq_max=SEQ_MAX, k=K, downsampling=DF, dim=16)
    train_cfg = TrainConfig()
    mesh = mesh_lib.make_mesh()
    key = jax.random.PRNGKey(1)
    params, opt_state = init_train_state(key, cfg, train_cfg, mesh)
    train_step, _ = make_train_step(cfg, train_cfg, mesh)

    ds = StructureDataset.from_dir(corpus_dir, DatasetConfig(featurize=featurize_config()))
    batch = mesh_lib.shard_batch(mesh, next(ds.batches(global_batch=8)))
    params, opt_state, _ = train_step(params, opt_state, batch, key)

    mgr = TrainCheckpointManager(str(tmp_path / "ckpt"), save_every=1)
    assert mgr.latest_step() is None
    assert mgr.save(0, params, opt_state, key, force=True)
    mgr.wait()
    assert mgr.latest_step() == 0

    # Restore into a fresh (differently-seeded) state: must equal the saved one.
    params2, opt2 = init_train_state(jax.random.PRNGKey(99), cfg, train_cfg, mesh)
    restored = mgr.restore(params2, opt2, jax.random.PRNGKey(99))
    assert restored is not None
    step, r_params, r_opt, r_rng = restored
    assert step == 0
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        r_params,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(opt_state),
        jax.device_get(r_opt),
    )
    np.testing.assert_array_equal(np.asarray(key), np.asarray(r_rng))

    # Resumed training continues without recompilation errors.
    params3, opt3, metrics = train_step(r_params, r_opt, batch, r_rng)
    assert np.isfinite(float(metrics["loss"]))
    mgr.close()


def test_save_every_gate(tmp_path):
    mgr = TrainCheckpointManager(str(tmp_path / "ckpt"), save_every=10)
    x = {"w": jax.numpy.ones((2,))}
    assert not mgr.save(3, x, x, jax.random.PRNGKey(0))
    assert mgr.save(10, x, x, jax.random.PRNGKey(0))
    mgr.wait()
    assert mgr.latest_step() == 10
    mgr.close()


@pytest.mark.slow
def test_context_parallel_train_step_matches(corpus_dir):
    """ctx-mesh training (quadratic tensors row-sharded over 'ctx') computes
    the same loss/grad-update as plain data-parallel training: cp.constrain
    only annotates shardings, so forward AND backward numerics are unchanged."""
    from protein_structure_tokenizer_tpu.parallel import cp

    cfg = tiny_preset(seq_max=SEQ_MAX, k=K, downsampling=DF, dim=16)
    train_cfg = TrainConfig(learning_rate=3e-4)
    ds = StructureDataset.from_dir(corpus_dir, DatasetConfig(featurize=featurize_config()))
    key = jax.random.PRNGKey(7)

    results = []
    for mesh in (mesh_lib.make_mesh(), cp.make_ctx_mesh(4)):
        params, opt_state = init_train_state(jax.random.PRNGKey(3), cfg, train_cfg, mesh)
        train_step, _ = make_train_step(cfg, train_cfg, mesh)
        batch = mesh_lib.shard_batch(mesh, next(ds.batches(global_batch=8)))
        params, opt_state, metrics = train_step(params, opt_state, batch, key)
        params, _, metrics2 = train_step(params, opt_state, batch, key)
        results.append((jax.device_get(params), float(metrics["loss"]), float(metrics2["loss"])))

    (p_dp, l_dp, l2_dp), (p_cp, l_cp, l2_cp) = results
    assert np.isfinite(l_cp)
    np.testing.assert_allclose(l_cp, l_dp, rtol=1e-5)
    np.testing.assert_allclose(l2_cp, l2_dp, rtol=1e-5)
    # Params after an Adam step: the partitioned program reduces in a
    # different order than the replicated one (~1e-7-level gradient noise),
    # and Adam AMPLIFIES that on near-zero-gradient leaves — the update
    # m/(sqrt(v)+eps) approaches +-lr with a noise-determined sign, so the
    # honest bound is a small fraction of lr (3e-4), not float noise.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4),
        p_dp,
        p_cp,
    )


@pytest.mark.slow
def test_fsdp_tokenizer_train_step_matches(corpus_dir):
    """FSDP tokenizer training (params + moments sharded over 'data',
    parallel/fsdp.py) is a pure layout change: loss and updated params match
    replicated data parallelism, and the bulk of state memory lives 1/n per
    device."""
    from protein_structure_tokenizer_tpu.parallel import fsdp
    from protein_structure_tokenizer_tpu.runtime.train import init_fsdp_train_state

    cfg = tiny_preset(seq_max=SEQ_MAX, k=K, downsampling=DF, dim=16)
    train_cfg = TrainConfig(learning_rate=3e-4)
    ds = StructureDataset.from_dir(corpus_dir, DatasetConfig(featurize=featurize_config()))
    key = jax.random.PRNGKey(7)
    mesh = mesh_lib.make_mesh()
    batch = mesh_lib.shard_batch(mesh, next(ds.batches(global_batch=8)))

    dp_params, dp_opt = init_train_state(jax.random.PRNGKey(3), cfg, train_cfg, mesh)
    dp_step, _ = make_train_step(cfg, train_cfg, mesh)

    fs_params, fs_opt, fs_sh = init_fsdp_train_state(
        jax.random.PRNGKey(3), cfg, train_cfg, mesh, min_shard_elems=1
    )
    assert fsdp.num_sharded_leaves(fs_params) > 0
    fs_step, _ = make_train_step(cfg, train_cfg, mesh, fsdp_state_shardings=fs_sh)

    dp_params, dp_opt, dp_m = dp_step(dp_params, dp_opt, batch, key)
    fs_params, fs_opt, fs_m = fs_step(fs_params, fs_opt, batch, key)
    dp_params, _, dp_m2 = dp_step(dp_params, dp_opt, batch, key)
    fs_params, _, fs_m2 = fs_step(fs_params, fs_opt, batch, key)

    np.testing.assert_allclose(float(fs_m["loss"]), float(dp_m["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(fs_m2["loss"]), float(dp_m2["loss"]), rtol=1e-5)
    assert fsdp.num_sharded_leaves(fs_params) > 0
    # Adam amplifies grad-reduction-order noise on near-zero leaves (update
    # = lr·m/(√v+ε) is scale-free), so give params a loose absolute bound:
    # a layout bug would show O(1) mismatches, not 1e-4.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4
        ),
        jax.device_get(dp_params),
        jax.device_get(fs_params),
    )
