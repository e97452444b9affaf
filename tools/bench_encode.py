"""Microbenchmark: encode forward variants on the real chip.

Usage: python tools/bench_encode.py [batch] [variant ...]
Variants: default (onehot fast path), pallas (fused kernels), exact.
Prints device-time estimates from repeated block_until_ready timing.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import preset
from protein_structure_tokenizer_tpu.data.types import ProteinGraphBatch


def synthetic_graph(batch, n, k, df, n_real, seed=0):
    rng = np.random.RandomState(seed)
    e = n * k
    senders = np.concatenate(
        [rng.randint(0, n_real, size=(n_real * k,)), np.repeat(np.arange(n_real, n), k)]
    ).astype(np.int32)
    receivers = np.repeat(np.arange(n), k).astype(np.int32)
    nodes_mask = (np.arange(n) < n_real).astype(np.float32)[:, None]
    t = n // df
    tokens_mask = (np.arange(t) < n_real // df).astype(np.float32)[:, None]
    edge_features = rng.randn(e, 27).astype(np.float32)
    coords = rng.randn(n, 3).astype(np.float32) * 10

    def tile(x):
        return jnp.asarray(np.stack([x] * batch))

    return ProteinGraphBatch(
        n_node=tile(np.array([n_real])),
        n_edge=tile(np.array([e])),
        nodes_mask=tile(nodes_mask),
        tokens_mask=tile(tokens_mask),
        nodes_original_coordinates=tile(coords),
        node_features=tile(coords),
        edge_features=tile(edge_features),
        senders=tile(senders),
        receivers=tile(receivers),
    )


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    variants = sys.argv[2:] or ["default", "pallas"]
    cfg = preset(4096, 1)
    params = jax.device_put(vq3d.init(jax.random.PRNGKey(0), cfg))

    kw = {
        "default": {},
        "pallas": {"use_pallas": True},
        "jnp": {"use_pallas": False},  # one-hot MXU fast path, no kernels
        "exact": {"exact_aggregation": True},
        "no_onehot": {"use_onehot": False},
    }
    from protein_structure_tokenizer_tpu.runtime.runner import pad_tokens_axis

    for n in (512, 256, 128):
        graph_n = pad_tokens_axis(
            synthetic_graph(batch, n, 50, 1, int(n * 0.8)),
            cfg.down_sampler.max_out_len,
        )
        for name in variants:
            fn = jax.jit(
                lambda p, g, kw=kw[name]: vq3d.encode_and_quantize(
                    p, cfg, g, compute_usage=False, **kw
                )["tokens"]
            )
            dt = timeit(fn, params, graph_n)
            res_per_s = batch * n / dt
            print(
                f"{name:10s} B={batch} N={n}: {dt*1e3:8.2f} ms/batch  "
                f"{res_per_s/1e3:8.1f}k res/s (padded)"
            )


if __name__ == "__main__":
    main()
