"""Pallas kernel correctness vs the jnp reference paths."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.models import fsq as fsq_lib


LEVEL_SETS = [(4, 4, 3, 3, 3), (4, 4, 4, 3, 3, 3), (4, 4, 4, 4, 4, 4), (8, 8, 8, 5, 5, 5)]


@pytest.mark.parametrize("levels", LEVEL_SETS, ids=lambda l: str(int(np.prod(l))))
def test_fsq_distances_kernel_matches_jnp(levels):
    from protein_structure_tokenizer_tpu.ops.fsq_kernels import fsq_distances

    cfg = fsq_lib.FsqConfig(levels=levels)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, len(levels)).astype(np.float32))
    bounded = fsq_lib.bound(cfg, x)

    codebook = fsq_lib.implicit_codebook(cfg)
    ref = jnp.sum((bounded[..., None, :] - codebook[None, None]) ** 2, axis=-1)
    try:
        ours = fsq_distances(bounded, levels=levels)
    except Exception as exc:  # platform without a Pallas lowering
        pytest.skip(f"pallas unavailable on {jax.default_backend()}: {exc}")
    # Bit-exact on TPU (validated on hardware); CPU interpret mode reduces the
    # D axis in a different order -> f32 ulp drift.
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-6, atol=1e-5
    )


def test_gnn_pallas_layer_matches_jnp():
    """Fused Pallas message kernels vs the jnp fast path on a full GNN stack."""
    from protein_structure_tokenizer_tpu.models.gnn import (
        GnnConfig,
        graph_neural_network,
        graph_neural_network_init,
    )

    cfg = GnnConfig(hidden_dimension=128, gnn_number_layers=2, graph_max_neighbor=4)
    rng = np.random.RandomState(0)
    b, n, k, d = 2, 16, 4, 128
    nodes = jnp.asarray(rng.randn(b, n, d).astype(np.float32) * 0.3)
    edges = jnp.asarray(rng.randn(b, n * k, d).astype(np.float32) * 0.3)
    senders = jnp.asarray(rng.randint(0, n, size=(b, n * k)).astype(np.int32))
    receivers = jnp.asarray(np.tile(np.repeat(np.arange(n), k)[None], (b, 1)).astype(np.int32))
    mask = jnp.asarray((rng.rand(b, n, 1) > 0.2).astype(np.float32))
    params = graph_neural_network_init(jax.random.PRNGKey(0), cfg)

    ref_nodes, ref_edges = graph_neural_network(
        params, cfg, nodes, edges, senders, receivers, mask, use_pallas=False
    )
    try:
        # exact_gather: the kernels' bit-exact bf16x3 sender gather, so the
        # only difference vs the jnp path is matmul association order.
        our_nodes, our_edges = graph_neural_network(
            params, cfg, nodes, edges, senders, receivers, mask,
            use_pallas="exact_gather",
        )
    except Exception as exc:
        pytest.skip(f"pallas unavailable on {jax.default_backend()}: {exc}")
    np.testing.assert_allclose(
        np.asarray(our_nodes), np.asarray(ref_nodes), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(our_edges), np.asarray(ref_edges), rtol=2e-5, atol=2e-5
    )

    # Fast bf16 single-pass gather: same envelope as the TPU one-hot fast
    # path (sender values truncated to bf16 before the message MLP).
    fast_nodes, fast_edges = graph_neural_network(
        params, cfg, nodes, edges, senders, receivers, mask, use_pallas=True
    )
    np.testing.assert_allclose(
        np.asarray(fast_nodes), np.asarray(ref_nodes), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(fast_edges), np.asarray(ref_edges), rtol=2e-2, atol=2e-2
    )


def test_quantize_distances_paths_agree():
    """quantize(compute_distances=True) jnp vs pallas paths produce the same
    soft_proba/distances."""
    cfg = fsq_lib.FsqConfig(levels=(4, 4, 4, 4, 4, 4))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 6).astype(np.float32))
    mask = jnp.ones((2, 8, 6), jnp.float32)

    ref = fsq_lib.quantize(
        cfg, x, mask, compute_usage=False, compute_distances=True, use_pallas=False
    )
    try:
        ours = fsq_lib.quantize(
            cfg, x, mask, compute_usage=False, compute_distances=True, use_pallas=True
        )
    except Exception as exc:
        pytest.skip(f"pallas unavailable on {jax.default_backend()}: {exc}")
    np.testing.assert_allclose(
        np.asarray(ours["distances"]), np.asarray(ref["distances"]), rtol=1e-6, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["soft_proba"]), np.asarray(ref["soft_proba"]), rtol=1e-5, atol=1e-6
    )


def test_pallas_gather_rows_exact():
    """ops/gather_kernels.py: in-register one-hot gather == take_along_axis
    bit-for-bit (bf16x3 split reconstructs f32 exactly under a one-hot)."""
    import jax
    import jax.numpy as jnp

    from protein_structure_tokenizer_tpu.ops.gather_kernels import gather_rows

    key = jax.random.PRNGKey(0)
    nodes = jax.random.normal(key, (3, 96, 128), jnp.float32) * 37.0
    idx = jax.random.randint(jax.random.PRNGKey(1), (3, 500), 0, 96)
    ref = jnp.take_along_axis(nodes, idx[..., None], axis=1)
    got = gather_rows(nodes, idx, e_tile=256)
    assert (np.asarray(ref) == np.asarray(got)).all()


def test_gather_rows_vjp_matches_take_along_axis_grad():
    """gather_rows_vjp: forward bit-exact, backward = scatter-add (same as
    differentiating take_along_axis)."""
    import jax

    from protein_structure_tokenizer_tpu.ops.gather_kernels import gather_rows_vjp

    key = jax.random.PRNGKey(3)
    nodes = jax.random.normal(key, (2, 32, 128), jnp.float32) * 11.0
    idx = jax.random.randint(jax.random.PRNGKey(4), (2, 100), 0, 32)

    def loss_kernel(n):
        return jnp.sum(jnp.sin(gather_rows_vjp(n, idx)))

    def loss_ref(n):
        return jnp.sum(jnp.sin(jnp.take_along_axis(n, idx[..., None], axis=1)))

    np.testing.assert_array_equal(
        np.asarray(loss_kernel(nodes)), np.asarray(loss_ref(nodes))
    )
    g_kernel = jax.grad(loss_kernel)(nodes)
    g_ref = jax.grad(loss_ref)(nodes)
    np.testing.assert_allclose(
        np.asarray(g_kernel), np.asarray(g_ref), rtol=1e-6, atol=1e-6
    )


def test_fused_ipa_softmax_matches_jnp():
    """ops/softmax_kernels.fused_ipa_softmax (interpret mode): identical to
    the jnp softmax chain on VALID query rows (the dropped |q|^2 row bias
    and row-mask component are softmax-invariant); masked query rows may
    differ but are row-local and masked downstream."""
    import jax
    import jax.numpy as jnp

    from protein_structure_tokenizer_tpu.ops.softmax_kernels import (
        fused_ipa_softmax,
    )

    rng = np.random.RandomState(5)
    B, H, N = 2, 3, 64
    logits = jnp.asarray(rng.randn(B, H, N, N).astype(np.float32) * 3)
    kn_bias = jnp.asarray((rng.rand(B, H, N) * 5).astype(np.float32))
    mask = (rng.rand(B, N) > 0.2).astype(np.float32)
    col_bias = -kn_bias - 1e5 * (1 - mask)[:, None, :]
    a2 = jnp.asarray(rng.randn(B, H, N, N).astype(np.float32)).astype(jnp.bfloat16)
    row_bias = jnp.asarray((rng.rand(B, H, N, 1) * 5).astype(np.float32))

    f32p, bf16p = fused_ipa_softmax(
        logits, col_bias, a2, emit_f32=True, interpret=True
    )
    assert f32p.dtype == jnp.float32 and bf16p.dtype == jnp.bfloat16

    # the full jnp chain the kernel replaces, INCLUDING the dropped row
    # terms (row bias + the mask's row component)
    mask2d = (mask[:, :, None] * mask[:, None, :])[:, None]
    ref = jax.nn.softmax(
        logits - row_bias - kn_bias[:, :, None, :] - 1e5 * (1 - mask2d)
        + a2.astype(jnp.float32),
        axis=-1,
    )
    err = np.abs(np.asarray(f32p, np.float64) - np.asarray(ref, np.float64))
    valid_rows = np.asarray(mask, bool)[:, None, :, None]
    assert (err * valid_rows).max() < 1e-5
    np.testing.assert_allclose(
        np.asarray(f32p).sum(-1), 1.0, atol=1e-5
    )  # masked rows are still normalized distributions
    # bf16 copy is the f32 result rounded
    np.testing.assert_array_equal(
        np.asarray(bf16p), np.asarray(f32p.astype(jnp.bfloat16))
    )

    # f32 output suppressed on request (the all-f32 path)
    none_out, only_bf16 = fused_ipa_softmax(
        logits, col_bias, a2, emit_f32=False, interpret=True
    )
    assert none_out is None
    np.testing.assert_array_equal(np.asarray(only_bf16), np.asarray(bf16p))


def test_structure_module_fused_softmax_gate():
    """The fused-softmax kernel must not engage on CPU / f32 / exact paths —
    structure_module outputs are identical with use_pallas True/False here
    (the gate requires a TPU backend and a bf16 stream)."""
    import jax
    import jax.numpy as jnp

    from protein_structure_tokenizer_tpu.models.structure_module import (
        StructureModuleConfig,
        structure_module,
        structure_module_init,
    )

    cfg = StructureModuleConfig(
        num_layer=2, num_channel=32, num_head=2, num_point_qk=2,
        num_point_v=3, num_scalar_qk=4, num_scalar_v=4,
        pair_channel=8, single_channel=16,
        sidechain=__import__(
            "protein_structure_tokenizer_tpu.models.structure_module",
            fromlist=["SidechainConfig"],
        ).SidechainConfig(num_channel=16, num_residual_block=1),
    )
    params = structure_module_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, N = 2, 16
    reps = {
        "single": jnp.asarray(rng.randn(B, N, 16).astype(np.float32)),
        "pair": jnp.asarray(rng.randn(B, N, N, 8).astype(np.float32)),
    }
    feats = {
        "aatype": jnp.asarray(np.eye(21, dtype=np.float32)[rng.randint(0, 20, (B, N))]),
        "atom37_gt_exists": jnp.ones((B, N, 37), jnp.float32),
    }
    mask = jnp.ones((B, N, 1), jnp.float32)
    a = structure_module(params, cfg, reps, feats, mask, use_pallas=True)
    b = structure_module(params, cfg, reps, feats, mask, use_pallas=False)
    np.testing.assert_array_equal(
        np.asarray(a["final_atom_positions"]), np.asarray(b["final_atom_positions"])
    )


def test_fused_layer_norm_matches_jnp():
    """ops/ln_kernels.fused_layer_norm (interpret mode): single-pass LN
    equals the jnp one-pass LN within bf16 output rounding; untileable
    shapes return None (caller falls back)."""
    import jax
    import jax.numpy as jnp

    from protein_structure_tokenizer_tpu.models.layers import layer_norm_1pass
    from protein_structure_tokenizer_tpu.ops.ln_kernels import fused_layer_norm

    rng = np.random.RandomState(7)
    scale = jnp.asarray(rng.rand(128).astype(np.float32))
    offset = jnp.asarray(rng.randn(128).astype(np.float32))
    p = {"scale": scale, "offset": offset}

    x = jnp.asarray(rng.randn(4, 64, 128).astype(np.float32)).astype(jnp.bfloat16)
    out = fused_layer_norm(x, scale, offset, interpret=True)
    assert out.dtype == jnp.bfloat16 and out.shape == x.shape
    ref = layer_norm_1pass(p, x)
    # kernel keeps f32 moments (the jnp path rounds the mean to bf16 before
    # the variance subtraction) — equal within bf16 output rounding
    np.testing.assert_allclose(
        np.asarray(out, np.float64), np.asarray(ref, np.float64), atol=0.05
    )
    # f32 input: tighter
    xf = jnp.asarray(rng.randn(2, 512, 128).astype(np.float32))
    outf = fused_layer_norm(xf, scale, offset, interpret=True)
    np.testing.assert_allclose(
        np.asarray(outf), np.asarray(layer_norm_1pass(p, xf)),
        atol=2e-5, rtol=0,
    )
    # rows not tileable / channels not 128-aligned -> fallback signal
    assert fused_layer_norm(x[:1, :3], scale, offset, interpret=True) is None
    assert fused_layer_norm(
        x[..., :64], scale[:64], offset[:64], interpret=True
    ) is None
