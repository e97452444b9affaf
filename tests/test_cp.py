"""Context parallelism (parallel/cp.py) on the 8-virtual-device CPU mesh.

The pair track (B, N, N, C) and IPA logits (B, h, i, j) are row-sharded over
a "ctx" mesh axis via GSPMD sharding constraints.  Decoding on the ctx mesh
must reproduce the single-device decode: the row-block math is identical
(softmax keys axis stays whole), so the pair track matches tightly and the
full 8-iteration structure output stays within float-accumulation drift.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import tiny_preset
from protein_structure_tokenizer_tpu.parallel import cp


@pytest.fixture(scope="module")
def setup():
    seq_max, k, df, dim = 16, 4, 2, 16
    cfg = tiny_preset(seq_max=seq_max, k=k, downsampling=df, dim=dim)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)

    batch, t = 4, seq_max // df
    rng = np.random.RandomState(0)
    tokens = rng.randint(0, 4096, size=(batch, t)).astype(np.uint32)
    quantized = vq3d.indexes_to_codes(cfg, jnp.asarray(tokens))
    n_real = 12
    nodes_mask = (np.arange(seq_max) < n_real).astype(np.float32)[None, :, None]
    tokens_mask = (np.arange(t) < n_real // df).astype(np.float32)[None, :, None]
    nodes_mask = jnp.asarray(np.tile(nodes_mask, (batch, 1, 1)))
    tokens_mask = jnp.asarray(np.tile(tokens_mask, (batch, 1, 1)))
    return cfg, params, quantized, nodes_mask, tokens_mask


def _ctx_inputs(mesh, quantized, nodes_mask, tokens_mask):
    data_sh = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(x, data_sh) for x in (quantized, nodes_mask, tokens_mask))


def test_ctx_decode_pair_track_matches(setup):
    cfg, params, quantized, nodes_mask, tokens_mask = setup
    _, s_ref, z_ref = vq3d.decode(params, cfg, quantized, nodes_mask, tokens_mask)

    mesh = cp.make_ctx_mesh(4)
    assert mesh.shape == {"data": 2, "ctx": 4}
    q, nm, tm = _ctx_inputs(mesh, quantized, nodes_mask, tokens_mask)
    _, s_cp, z_cp = jax.jit(
        lambda *a: vq3d.decode(params, cfg, *a, mesh=mesh)
    )(q, nm, tm)

    # The pair tensor actually lands row-sharded over ctx.
    assert "ctx" in {ax for axes in z_cp.sharding.spec if axes for ax in (
        axes if isinstance(axes, tuple) else (axes,))}
    np.testing.assert_allclose(np.asarray(s_cp), np.asarray(s_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_cp), np.asarray(z_ref), atol=1e-5)


def test_ctx_full_structure_matches(setup):
    cfg, params, quantized, nodes_mask, tokens_mask = setup
    ref = vq3d.decode_and_make_structure(
        params, cfg, quantized, nodes_mask, tokens_mask
    )

    mesh = cp.make_ctx_mesh(4)
    q, nm, tm = _ctx_inputs(mesh, quantized, nodes_mask, tokens_mask)
    out = jax.jit(
        lambda *a: vq3d.decode_and_make_structure(params, cfg, *a, mesh=mesh)
    )(q, nm, tm)

    np.testing.assert_array_equal(
        np.asarray(out["final_atom_mask"]), np.asarray(ref["final_atom_mask"])
    )
    # First refinement iteration: tight; the full trajectory stays close at
    # tiny dims (8 iterations of f32 drift amplification).
    np.testing.assert_allclose(
        np.asarray(out["traj"])[0], np.asarray(ref["traj"])[0], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["final_atom_positions"]),
        np.asarray(ref["final_atom_positions"]),
        atol=1e-3,
    )


def test_ctx_mesh_validation():
    with pytest.raises(ValueError):
        cp.make_ctx_mesh(3)
    assert not cp.has_ctx_axis(None)
    mesh1 = cp.make_ctx_mesh(1)
    assert not cp.has_ctx_axis(mesh1)  # degenerate axis -> constraints no-op


def test_runner_context_parallel_decode(tmp_path, setup):
    """InferenceRunner(context_parallel=4): decode_tokens writes the same
    PDBs as the data-parallel runner."""
    from protein_structure_tokenizer_tpu.runtime.runner import InferenceRunner

    cfg, params, _, _, _ = setup
    rng = np.random.RandomState(1)
    token_files = []
    for i in range(2):
        f = tmp_path / f"s{i}_tokens.npy"
        np.save(f, rng.randint(0, 4096, size=(1, 6)).astype(np.uint32))
        token_files.append(str(f))

    r_dp = InferenceRunner(cfg, params)
    out_dp = r_dp.decode_tokens(
        token_files, str(tmp_path / "dp"), batch_size_per_device=1
    )
    r_cp = InferenceRunner(cfg, params, context_parallel=4)
    assert r_cp.mesh.shape == {"data": 2, "ctx": 4}
    out_cp = r_cp.decode_tokens(
        token_files, str(tmp_path / "cp"), batch_size_per_device=1
    )
    assert set(out_dp) == set(out_cp)
    for name in out_dp:
        np.testing.assert_allclose(
            out_cp[name].atom_positions, out_dp[name].atom_positions, atol=1e-3
        )


def test_ctx_encode_tokens_match(setup):
    """Context-parallel encode: token ids identical to the single-device
    path with the edge table row-sharded over "ctx"."""
    from protein_structure_tokenizer_tpu.data.types import ProteinGraphBatch

    cfg, params, _, _, _ = setup
    seq_max, k = cfg.data.seq_max_size, cfg.encoder.gnn.graph_max_neighbor
    batch, n_real = 4, 12
    rng = np.random.RandomState(2)
    senders = np.concatenate([
        rng.randint(0, n_real, size=(n_real * k,)),
        np.repeat(np.arange(n_real, seq_max), k),
    ]).astype(np.int32)
    receivers = np.repeat(np.arange(seq_max), k).astype(np.int32)
    nodes_mask = (np.arange(seq_max) < n_real).astype(np.float32)[:, None]
    t = seq_max // cfg.data.downsampling_ratio
    tokens_mask = (np.arange(t) < n_real // cfg.data.downsampling_ratio).astype(
        np.float32
    )[:, None]
    edges = rng.randn(seq_max * k, 27).astype(np.float32)
    edges[n_real * k:] = 0

    def tile(x):
        return jnp.asarray(np.stack([x] * batch))

    graph = ProteinGraphBatch(
        n_node=tile(np.array([n_real])),
        n_edge=tile(np.array([seq_max * k])),
        nodes_mask=tile(nodes_mask),
        tokens_mask=tile(tokens_mask),
        nodes_original_coordinates=tile((rng.randn(seq_max, 3) * 10).astype(np.float32)),
        node_features=tile(np.zeros((seq_max, 3), np.float32)),
        edge_features=tile(edges),
        senders=tile(senders),
        receivers=tile(receivers),
    )

    ref = vq3d.encode_and_quantize(params, cfg, graph, compute_usage=False)["tokens"]

    mesh = cp.make_ctx_mesh(4)
    from jax.sharding import NamedSharding

    data_sh = NamedSharding(mesh, P("data"))
    graph_cp = jax.tree_util.tree_map(lambda x: jax.device_put(x, data_sh), graph)
    out = jax.jit(
        lambda g: vq3d.encode_and_quantize(
            params, cfg, g, compute_usage=False, mesh=mesh
        )["tokens"]
    )(graph_cp)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
