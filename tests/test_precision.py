"""Mixed-precision policy wrapper."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protein_structure_tokenizer_tpu.runtime.precision import (
    cast_floats,
    mixed_precision_policy,
)


def test_cast_floats_leaves_ints_alone():
    tree = {"w": jnp.ones((2,), jnp.float32), "idx": jnp.arange(3)}
    out = cast_floats(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["idx"].dtype == jnp.int32


def test_policy_computes_in_bf16_outputs_f32():
    seen = {}

    def fn(params, x):
        seen["dtype"] = x.dtype
        return {"y": x @ params["w"], "n": jnp.int32(1)}

    wrapped = mixed_precision_policy(fn)
    params = {"w": jnp.eye(4, dtype=jnp.float32)}
    x = jnp.ones((2, 4), jnp.float32)
    out = wrapped(params, x)
    assert seen["dtype"] == jnp.bfloat16
    assert out["y"].dtype == jnp.float32
    assert out["n"].dtype == jnp.int32
    np.testing.assert_allclose(np.asarray(out["y"]), np.ones((2, 4)), rtol=1e-2)


def test_policy_on_tokenizer_encode():
    """bf16 policy runs the full encode path and produces valid token ids."""
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _synthetic_graph
    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.models.config import preset

    cfg = preset(4096, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    graph = _synthetic_graph(1, 512, 50, 1, 96)

    fn = mixed_precision_policy(
        lambda p, g: vq3d.encode_and_quantize(p, cfg, g, compute_usage=False)
    )
    out = fn(params, graph)
    tokens = np.asarray(out["tokens"])
    assert tokens.dtype == np.uint32
    assert tokens.max() < 4096

    f32 = vq3d.encode_and_quantize(params, cfg, graph, compute_usage=False)
    match = (tokens == np.asarray(f32["tokens"]))[:, :96].mean()
    assert match > 0.9, f"bf16 token agreement unexpectedly low: {match}"


def test_bf16_runner_decode():
    """bf16 runner decode produces structures close to the f32 path."""
    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.models.config import tiny_preset
    from protein_structure_tokenizer_tpu.runtime.runner import InferenceRunner

    cfg = tiny_preset(seq_max=16, k=4, downsampling=2, dim=16)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    f32_runner = InferenceRunner(cfg, params)
    bf16_runner = InferenceRunner(cfg, params, compute_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    quantized = jnp.asarray(rng.randn(8, 8, 6).astype(np.float32))
    nodes_mask = jnp.ones((8, 16, 1), jnp.float32)
    tokens_mask = jnp.ones((8, 8, 1), jnp.float32)

    out32 = f32_runner.decode_fn(f32_runner.params, quantized, nodes_mask, tokens_mask)
    out16 = bf16_runner.decode_fn(bf16_runner.params, quantized, nodes_mask, tokens_mask)
    p32 = np.asarray(out32["backbone_positions"])
    p16 = np.asarray(out16["backbone_positions"])
    assert p16.dtype == np.float32  # outputs cast back
    assert np.isfinite(p16).all()
    scale = np.abs(p32).mean() + 1e-6
    assert np.abs(p16 - p32).mean() / scale < 0.1, (
        np.abs(p16 - p32).mean(), scale
    )


@pytest.mark.slow
@pytest.mark.parametrize("bucket", [128, 512])
def test_bf16_decode_bucket_tolerances(bucket):
    """Pinned per-bucket coordinate tolerances for the bf16 decode path —
    the policy that lets the BENCH/non-conformance decode default to bf16
    (the f32 ``--exact``/conformance path is untouched).

    Random weights are the WORST case: the 8 chaotic fold iterations amplify
    bf16 rounding to ~0.9 A mean drift (measured 0.83-0.89 A across buckets,
    CA-RMSD 1.18-1.29 A); trained weights converge the fold to a fixed point.
    Bounds sit ~1.5x above the measured random-weight drift so a numerics
    regression trips them while backend noise does not."""
    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.models.config import preset
    from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
    from protein_structure_tokenizer_tpu.runtime.runner import InferenceRunner

    cfg = preset(4096, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    mesh = mesh_lib.make_mesh(jax.devices()[:1])
    r32 = InferenceRunner(cfg, params, mesh)
    r16 = InferenceRunner(cfg, params, mesh, compute_dtype=jnp.bfloat16)

    n = bucket - 7  # off-bucket length: pad rows must not affect tolerance
    rng = np.random.RandomState(bucket)
    ids = r32.pad_token_rows(
        [rng.randint(0, cfg.fsq.num_codes, size=(n,))], effective_len=bucket
    )
    _, o32 = r32.dispatch_decode(ids)
    _, o16 = r16.dispatch_decode(ids)
    p32 = np.asarray(o32["backbone_positions"])[0, :n]
    p16 = np.asarray(o16["backbone_positions"])[0, :n]

    assert p16.dtype == np.float32 and np.isfinite(p16).all()
    dist = np.linalg.norm(p16 - p32, axis=-1)
    ca_rmsd = np.sqrt(((p16[:, 1] - p32[:, 1]) ** 2).sum(-1).mean())
    assert dist.mean() < 1.5, f"bucket {bucket}: mean drift {dist.mean():.3f} A"
    assert dist.max() < 6.0, f"bucket {bucket}: max drift {dist.max():.3f} A"
    assert ca_rmsd < 2.0, f"bucket {bucket}: CA-RMSD {ca_rmsd:.3f} A"


def test_bf16_incompatible_with_exact():
    import pytest as _pytest

    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.models.config import tiny_preset
    from protein_structure_tokenizer_tpu.runtime.runner import InferenceRunner

    cfg = tiny_preset()
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    with _pytest.raises(ValueError):
        InferenceRunner(cfg, params, exact_aggregation=True, compute_dtype=jnp.bfloat16)
