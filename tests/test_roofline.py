"""Analytic FLOP counter: exactness on known shapes, recursion through
scan/jit, and agreement with closed-form GPT math."""
import jax
import jax.numpy as jnp
import numpy as np

from protein_structure_tokenizer_tpu.lm import gpt, sampling
from protein_structure_tokenizer_tpu.utils import roofline


def test_plain_matmul_flops():
    a = jnp.zeros((8, 32))
    b = jnp.zeros((32, 16))
    flops = roofline.count_matmul_flops(lambda x, y: x @ y, a, b)
    assert flops == 2 * 8 * 16 * 32


def test_batched_einsum_flops():
    a = jnp.zeros((4, 8, 32))
    b = jnp.zeros((4, 32, 16))
    flops = roofline.count_matmul_flops(
        lambda x, y: jnp.einsum("bmk,bkn->bmn", x, y), a, b
    )
    assert flops == 2 * 4 * 8 * 16 * 32


def test_scan_multiplies_by_length():
    w = jnp.zeros((16, 16))

    def fn(w):
        def body(x, _):
            return x @ w, None

        out, _ = jax.lax.scan(body, jnp.zeros((4, 16)), None, length=7)
        return out

    assert roofline.count_matmul_flops(fn, w) == 7 * 2 * 4 * 16 * 16


def test_recurses_through_jit():
    a = jnp.zeros((8, 8))
    inner = jax.jit(lambda x: x @ x)
    assert roofline.count_matmul_flops(inner, a) == 2 * 8 * 8 * 8


def test_gpt_forward_matches_closed_form():
    cfg = gpt.GptConfig(
        vocab_size=40, embed_dim=32, ffn_embed_dim=64, num_heads=4,
        num_layers=3, rope_dimensions=4, max_position_embeddings=12,
    )
    params = gpt.init(jax.random.PRNGKey(0), cfg)
    B, T, C, F, V, L = 2, 10, cfg.embed_dim, cfg.ffn_embed_dim, cfg.vocab_size, cfg.num_layers
    tokens = jnp.zeros((B, T), jnp.int32)

    counted = roofline.count_matmul_flops(
        lambda p, t: gpt.forward(p, cfg, t)["logits"], params, tokens
    )
    per_layer = (
        4 * 2 * B * T * C * C      # q, k, v, out projections
        + 2 * 2 * B * T * T * C    # QK^T and AV (summed over heads)
        + 2 * B * T * C * 2 * F    # GLU fc1 (fused (C, 2F) weight)
        + 2 * B * T * F * C        # fc2
    )
    expected = L * per_layer + 2 * B * T * C * V  # + lm head
    assert counted == expected


def test_generate_scan_counts_all_steps():
    cfg = gpt.GptConfig(
        vocab_size=20, embed_dim=16, ffn_embed_dim=32, num_heads=2,
        num_layers=2, rope_dimensions=4, max_position_embeddings=8,
    )
    params = gpt.init(jax.random.PRNGKey(0), cfg)
    flops = roofline.count_matmul_flops(
        lambda p, k: sampling.generate(p, cfg, k, 2, 8, use_cache=True),
        params, jax.random.PRNGKey(1),
    )
    # 8 scan steps, each a full cached forward (T=1 query, 8-position cache)
    single_step = roofline.count_matmul_flops(
        lambda p, t, c: gpt.forward_step(p, cfg, t, c, jnp.int32(0))[0],
        params, jnp.zeros((2, 1), jnp.int32), gpt.init_kv_cache(cfg, 2, 8),
    )
    assert flops == 8 * single_step
    assert single_step > 0


def test_generate_block_bytes_segment_math():
    cfg = gpt.GptConfig(
        vocab_size=20, embed_dim=16, ffn_embed_dim=32, num_heads=2,
        num_layers=2, rope_dimensions=4, max_position_embeddings=8,
    )
    params = {"w": jnp.zeros((4,), jnp.bfloat16)}
    full = roofline.generate_block_bytes(params, cfg, batch=1, block=8)
    seg = roofline.generate_block_bytes(params, cfg, batch=1, block=8, segment=4)
    p = 4 * 2  # param bytes
    per_pos = 2 * cfg.num_layers * cfg.embed_dim * 2  # k+v, bf16
    assert full == p * 8 + per_pos * 8 * 8
    # kv_len per step with S=4: 4,4,4,4,8,8,8,8 -> 48 position-reads
    assert seg == p * 8 + per_pos * 48


def test_tree_float_bytes_counts_dtype():
    tree = {"a": jnp.zeros((4, 4), jnp.float32), "b": jnp.zeros((8,), jnp.bfloat16),
            "i": jnp.zeros((16,), jnp.int32)}
    assert roofline.tree_float_bytes(tree) == 4 * 4 * 4 + 8 * 2


def test_tokenize_flops_traceable():
    """The dense tokenize path traces and yields a stable positive count."""
    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.models.config import preset
    from protein_structure_tokenizer_tpu.data.featurize import make_graph_from_pdb
    from protein_structure_tokenizer_tpu.runtime.runner import collate_graphs
    import dataclasses, glob, os

    cfg = preset(432, 1)
    pdb = sorted(glob.glob("/root/reference/casp14_pdbs/*.pdb"))[0]
    graph = collate_graphs([dataclasses.asdict(make_graph_from_pdb(pdb))])
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    flops = roofline.count_matmul_flops(
        lambda p, g: vq3d.encode_and_quantize(
            p, cfg, g, compute_usage=False, use_pallas=False
        )["tokens"],
        params, graph,
    )
    assert flops > 1e9  # B=1, N=512: multiple GFLOPs of matmul work
