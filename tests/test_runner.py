"""Runner integration tests on an 8-virtual-device CPU mesh."""
import glob
import os

import numpy as np
import pytest

import jax

from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import preset
from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
from protein_structure_tokenizer_tpu.runtime.runner import (
    InferenceRunner,
    build_nodes_mask_from_tokens_mask,
    build_tokens_mask_from_sequence,
)

CASP14 = sorted(glob.glob("/root/reference/casp14_pdbs/*.pdb"))


def test_mesh_has_eight_devices():
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8


def test_masks_from_token_sequences():
    tokens = np.array([[5, 7, 9, 4097, 4097], [1, 4097, 2, 3, 4097]])
    tm = build_tokens_mask_from_sequence(tokens, 4097)
    np.testing.assert_array_equal(tm, [[1, 1, 1, 0, 0], [1, 0, 0, 0, 0]])
    nm = build_nodes_mask_from_tokens_mask(tm, 2)
    assert nm.shape == (2, 10)
    np.testing.assert_array_equal(nm.sum(axis=-1), [6, 2])


def test_packed_backbone_decode_matches_full_atom37():
    """The runner ships only the 5 backbone atom37 slots over the wire;
    host-side expansion must be bitwise what decode_and_make_structure
    produces on device (slots 5..36 are identically zero for dummy-ALA)."""
    import jax.numpy as jnp

    from protein_structure_tokenizer_tpu.models.config import tiny_preset
    from protein_structure_tokenizer_tpu.runtime.runner import expand_backbone_atoms

    cfg = tiny_preset(seq_max=16, k=4, downsampling=2, dim=16)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    runner = InferenceRunner(cfg, params)

    rng = np.random.RandomState(0)
    quantized = jnp.asarray(rng.randn(8, 8, 6).astype(np.float32))
    nodes_mask = jnp.ones((8, 16, 1), jnp.float32)
    tokens_mask = jnp.ones((8, 8, 1), jnp.float32)

    packed = runner.decode_fn(runner.params, quantized, nodes_mask, tokens_mask)
    assert np.asarray(packed["backbone_positions"]).shape == (8, 16, 5, 3)

    # The packing assumptions, pinned on the full device output: every atom37
    # slot >= 5 (and CB=3) is identically zero and the mask is the constant
    # dummy-ALA pattern — so shipping slots 0-4 loses nothing.
    full = vq3d.decode_and_make_structure(
        params, cfg, quantized, nodes_mask, tokens_mask
    )
    full_pos = np.asarray(full["final_atom_positions"])
    assert (full_pos[..., 5:, :] == 0).all()
    assert (full_pos[..., 3, :] == 0).all()
    pos, mask = expand_backbone_atoms(full_pos[..., :5, :])
    np.testing.assert_array_equal(pos, full_pos)
    np.testing.assert_array_equal(mask, np.asarray(full["final_atom_mask"]))


@pytest.mark.skipif(not CASP14, reason="CASP14 corpus not mounted")
@pytest.mark.slow
def test_tokenize_decode_roundtrip(tmp_path):
    cfg = preset(4096, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    runner = InferenceRunner(cfg, params)

    pdbs = CASP14[:2]
    tokens = runner.tokenize(
        pdbs, str(tmp_path / "tokens"), batch_size_per_device=1
    )
    assert len(tokens) == 2
    for name, arr in tokens.items():
        assert arr.ndim == 2 and arr.shape[0] == 1
        assert arr.shape[1] > 50  # real token count, unpadded
        assert arr.dtype == np.uint32
        assert os.path.exists(tmp_path / "tokens" / f"{name}_tokens.npy")

    token_files = sorted(glob.glob(str(tmp_path / "tokens" / "*.npy")))
    structures = runner.decode_tokens(
        token_files, str(tmp_path / "structs"), batch_size_per_device=1
    )
    assert len(structures) == 2
    for name, prot in structures.items():
        # Backbone-only reconstruction: N, CA, C, O present per residue.
        assert prot.atom_positions.shape[1] == 37
        assert np.isfinite(prot.atom_positions[prot.atom_mask.astype(bool)]).all()
        assert prot.atom_mask[:, :3].all() and prot.atom_mask[:, 4].all()
        pdb_file = tmp_path / "structs" / "structures" / f"structure_{name}.pdb"
        assert pdb_file.exists()
        text = pdb_file.read_text()
        assert text.startswith("MODEL") and "ATOM" in text

    # Token counts correspond to residue counts (df=1).
    from protein_structure_tokenizer_tpu.data.sample import parse_pdb_file

    for path in pdbs:
        name = os.path.basename(path).split(".pdb")[0]
        n_res = parse_pdb_file(path).nb_residues
        assert tokens[name].shape[1] == n_res
        assert len(structures[name].aatype) == n_res


@pytest.mark.skipif(not CASP14, reason="CASP14 corpus not mounted")
@pytest.mark.slow
def test_autoencode_roundtrip(tmp_path):
    """Full AE in one device pass: tokens + reconstruction + metrics.pkl."""
    import pickle

    cfg = preset(4096, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    runner = InferenceRunner(cfg, params)

    out = runner.autoencode(CASP14[:2], str(tmp_path), batch_size_per_device=1)
    assert len(out) == 2
    from protein_structure_tokenizer_tpu.data.sample import parse_pdb_file

    for path in CASP14[:2]:
        name = os.path.basename(path).split(".pdb")[0]
        entry = out[name]
        n_res = parse_pdb_file(path).nb_residues
        assert entry["tokens"].shape == (n_res,)
        assert len(entry["predicted"].aatype) == n_res
        assert len(entry["target"].aatype) == n_res
        # Target must reproduce the input CA coordinates.
        sample = parse_pdb_file(path)
        np.testing.assert_allclose(
            entry["target"].atom_positions[:, 1],
            sample.atom37_positions[: n_res, 1],
            atol=1e-3,
        )
        assert {"rmsd", "tm", "gdt_ts"} <= set(entry["metrics"])
        assert (tmp_path / "structures" / f"predicted_structure_{name}.pdb").exists()
        assert (tmp_path / "structures" / f"target_structure_{name}.pdb").exists()

    with open(tmp_path / "metrics.pkl", "rb") as f:
        metrics = pickle.load(f)
    assert set(metrics) == {os.path.basename(p).split(".pdb")[0] for p in CASP14[:2]}

    # AE tokens match the tokenize path (same encoder).
    tok = runner.tokenize(CASP14[:2], batch_size_per_device=1)
    for name, entry in out.items():
        np.testing.assert_array_equal(entry["tokens"], tok[name].reshape(-1))


@pytest.mark.skipif(not CASP14, reason="CASP14 corpus not mounted")
def test_tokenize_skip_invalid(tmp_path):
    """A malformed/short PDB is skipped with skip_invalid; others tokenize."""
    bad = tmp_path / "bad.pdb"
    bad.write_text("ATOM      1  CA  ALA A   1      0.0   0.0   0.0  1.00  0.00           C\n")

    cfg = preset(4096, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    runner = InferenceRunner(cfg, params)

    paths = [CASP14[0], str(bad)]
    # Fail-fast default matches the reference.
    with pytest.raises(Exception):
        runner.tokenize(paths, batch_size_per_device=1)

    tokens = runner.tokenize(paths, batch_size_per_device=1, skip_invalid=True)
    good = os.path.basename(CASP14[0]).split(".pdb")[0]
    assert good in tokens
    assert "bad" not in tokens


@pytest.mark.skipif(not CASP14, reason="CASP14 corpus not mounted")
def test_tokens_independent_of_mesh_topology():
    """Token ids must not depend on how the batch is sharded: a 1-device mesh
    and the full 8-device mesh produce byte-identical tokens for the same
    inputs (SURVEY.md §7 hard part 5: multi-host/topology determinism)."""
    cfg = preset(4096, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    pdbs = CASP14[:2]

    runner_1 = InferenceRunner(cfg, params, mesh_lib.make_mesh(jax.devices()[:1]))
    runner_8 = InferenceRunner(cfg, params, mesh_lib.make_mesh())
    tokens_1 = runner_1.tokenize(pdbs, batch_size_per_device=8)
    tokens_8 = runner_8.tokenize(pdbs, batch_size_per_device=1)

    assert tokens_1.keys() == tokens_8.keys()
    for name in tokens_1:
        np.testing.assert_array_equal(tokens_1[name], tokens_8[name])


def test_make_output_dir_refuses_stale_dir(tmp_path, monkeypatch):
    """A pre-existing dir with user data is refused by process 0 — and the
    user's files are untouched, no sentinel left behind."""
    from protein_structure_tokenizer_tpu.runtime import runner as runner_mod

    stale = tmp_path / "out"
    stale.mkdir()
    (stale / "user_data.txt").write_text("precious")
    monkeypatch.setattr(runner_mod, "_P0_WAIT_S", 0.2)
    with pytest.raises(FileExistsError):
        runner_mod._make_output_dir(str(stale))
    assert sorted(p.name for p in stale.iterdir()) == ["user_data.txt"]
    assert (stale / "user_data.txt").read_text() == "precious"


def test_make_output_dir_peer_refuses_stale_without_polluting(tmp_path, monkeypatch):
    """Non-zero processes must NOT write into a pre-existing dir before
    process 0's verdict: with no creator sentinel ever appearing, the peer
    times out, raises, and leaves the user's dir byte-identical (the
    round-2 race: peers used to drop their sentinel immediately)."""
    from protein_structure_tokenizer_tpu.runtime import runner as runner_mod

    stale = tmp_path / "out"
    stale.mkdir()
    (stale / "user_data.txt").write_text("precious")
    monkeypatch.setattr(runner_mod, "_PEER_WAIT_S", 0.3)
    monkeypatch.setattr(runner_mod.jax, "process_index", lambda: 1)
    with pytest.raises(FileExistsError):
        runner_mod._make_output_dir(str(stale))
    assert sorted(p.name for p in stale.iterdir()) == ["user_data.txt"]


def test_make_output_dir_peer_joins_racing_creator(tmp_path, monkeypatch):
    """A dir whose creator already dropped THIS run's sentinel is a racing
    peer: every other process joins it without error."""
    from protein_structure_tokenizer_tpu.runtime import runner as runner_mod

    won = tmp_path / "out"
    won.mkdir()
    (won / runner_mod._RUN_SENTINEL).write_text(runner_mod._run_identity())
    monkeypatch.setattr(runner_mod.jax, "process_index", lambda: 1)
    runner_mod._make_output_dir(str(won))  # must not raise
    # process 0 also joins (its shorter wait still sees the sentinel)
    monkeypatch.setattr(runner_mod.jax, "process_index", lambda: 0)
    runner_mod._make_output_dir(str(won))


def test_make_output_dir_refuses_foreign_run_sentinel(tmp_path, monkeypatch):
    """A live sentinel carrying a DIFFERENT run's id means two overlapping
    runs point at the same dir: refuse rather than interleave outputs (the
    pre-run-id protocol silently joined any live sentinel)."""
    from protein_structure_tokenizer_tpu.runtime import runner as runner_mod

    other = tmp_path / "out"
    other.mkdir()
    (other / runner_mod._RUN_SENTINEL).write_text("feedfacecafebeef")
    monkeypatch.setattr(runner_mod.jax, "process_index", lambda: 1)
    with pytest.raises(FileExistsError, match="different live run"):
        runner_mod._make_output_dir(str(other))
    # the foreign run's dir is untouched
    assert (other / runner_mod._RUN_SENTINEL).read_text() == "feedfacecafebeef"


def test_make_output_dir_fresh_creates_sentinel(tmp_path):
    from protein_structure_tokenizer_tpu.runtime import runner as runner_mod

    fresh = tmp_path / "out"
    runner_mod._make_output_dir(str(fresh))
    assert (fresh / runner_mod._RUN_SENTINEL).exists()
    runner_mod._finish_output_dir(str(fresh))
    assert not (fresh / runner_mod._RUN_SENTINEL).exists()


def test_decode_independent_of_mesh_topology():
    """Decoded coordinates must not depend on how the batch is sharded: the
    1-device jit path and the 8-device shard_map path (runner's pure-data
    SPMD mode) produce identical backbones for the same token rows."""
    cfg = preset(4096, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    seqs = [rng.randint(0, cfg.fsq.num_codes, size=(n,)) for n in (40, 64, 25, 50,
                                                                   33, 61, 47, 58)]

    runner_1 = InferenceRunner(cfg, params, mesh_lib.make_mesh(jax.devices()[:1]))
    runner_8 = InferenceRunner(cfg, params, mesh_lib.make_mesh())
    ids = runner_1.pad_token_rows(seqs, effective_len=64)
    _, out_1 = runner_1.dispatch_decode(ids)
    _, out_8 = runner_8.dispatch_decode(ids)
    np.testing.assert_array_equal(
        np.asarray(out_1["backbone_positions"]),
        np.asarray(out_8["backbone_positions"]),
    )


def test_shard_map_pads_non_divisible_batches():
    """The SPMD shard_map path must accept batches whose row count does not
    divide mesh.size (public dispatch_decode/decode_fn contract): rows are
    edge-padded on dispatch, outputs sliced back, values identical to the
    divisible-batch result."""
    cfg = preset(4096, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    seqs = [rng.randint(0, cfg.fsq.num_codes, size=(n,)) for n in (40, 25, 50)]

    runner_8 = InferenceRunner(cfg, params, mesh_lib.make_mesh())  # 8 devices
    ids3 = runner_8.pad_token_rows(seqs, effective_len=64)  # 3 rows: 8 % 3 != 0
    _, out3 = runner_8.dispatch_decode(ids3)
    assert np.asarray(out3["backbone_positions"]).shape[0] == 3

    runner_1 = InferenceRunner(cfg, params, mesh_lib.make_mesh(jax.devices()[:1]))
    _, ref = runner_1.dispatch_decode(ids3)
    np.testing.assert_array_equal(
        np.asarray(out3["backbone_positions"]),
        np.asarray(ref["backbone_positions"]),
    )


def test_shard_map_lower_rejects_non_divisible_batches():
    """lower() bypasses the edge-padding wrapper, so it must refuse a
    non-divisible batch with a clear message instead of surfacing an opaque
    shard_map error (and never silently drop the padding contract)."""
    import jax.numpy as jnp
    import pytest

    mesh = mesh_lib.make_mesh()  # 8 virtual devices
    fn = mesh_lib.data_shard_map(lambda p, x: {"y": x * p["s"]}, mesh, 1)
    params = {"s": jnp.float32(2.0)}
    with pytest.raises(ValueError, match="edge-padding contract"):
        fn.lower(params, jnp.ones((3, 4)))
    # divisible batches still lower fine
    fn.lower(params, jnp.ones((8, 4)))


def test_fused_decode_tokens_matches_unfused():
    """dispatch_decode's fused decode-from-token-ids program (mask building +
    FSQ codec + decode in one jit) is bit-identical to the unfused
    3-transfer/2-dispatch path it replaced."""
    cfg = preset(4096, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(2)
    seqs = [rng.randint(0, cfg.fsq.num_codes, size=(n,)) for n in (40, 64, 25, 50)]

    runner = InferenceRunner(cfg, params, mesh_lib.make_mesh(jax.devices()[:1]))
    ids = runner.pad_token_rows(seqs, effective_len=64)

    num_nodes, fused = runner.dispatch_decode(ids)

    import jax.numpy as jnp

    from protein_structure_tokenizer_tpu.runtime import runner as runner_mod

    tokens_mask = runner_mod.build_tokens_mask_from_sequence(
        ids, cfg.data.pad_token_id
    )
    nodes_mask = runner_mod.build_nodes_mask_from_tokens_mask(
        tokens_mask, cfg.data.downsampling_ratio
    )
    quantized = runner.indexes_to_codes_fn(jnp.asarray(ids))
    unfused = runner.decode_fn(
        runner.params,
        jnp.asarray(quantized),
        jnp.asarray(nodes_mask[..., None], dtype=jnp.float32),
        jnp.asarray(tokens_mask[..., None], dtype=jnp.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(fused["backbone_positions"]),
        np.asarray(unfused["backbone_positions"]),
    )
    np.testing.assert_array_equal(num_nodes, nodes_mask.sum(axis=-1))

    # A non-default pad id still round-trips through the unfused fallback.
    alt_pad = cfg.data.pad_token_id - 1
    ids_alt = runner.pad_token_rows(seqs, pad_token_id=alt_pad, effective_len=64)
    n_alt, out_alt = runner.dispatch_decode(ids_alt, pad_token_id=alt_pad)
    assert np.asarray(out_alt["backbone_positions"]).shape[0] == len(seqs)
    np.testing.assert_array_equal(n_alt, num_nodes)
