"""A/B: GPT generate f32 vs bf16 (params + KV cache) across batch sizes.

Usage: python tools/bench_generate_ab.py [--batches 16,64] [--dtypes f32,bf16]
Prints tokens/s/chip per (dtype, batch) under the bench.py timing protocol
(best of N whole blocks, host-fetch completion barriers).
"""
import argparse
import os
import sys
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import jax

os.makedirs(os.path.join(REPO_ROOT, ".jax_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from protein_structure_tokenizer_tpu.lm import gpt, sampling
from protein_structure_tokenizer_tpu.runtime.precision import cast_floats

T0 = time.monotonic()


def note(msg):
    print(f"# [{time.monotonic() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def measure(params, cfg, batch, windows=5, iters=3):
    jfn = jax.jit(
        lambda p, k: sampling.generate(
            p, cfg, k, batch, cfg.max_position_embeddings, use_cache=True
        )
    )
    t = time.monotonic()
    np.asarray(jfn(params, jax.random.PRNGKey(1)))
    note(f"compiled+warm in {time.monotonic() - t:.1f}s")

    def block():
        start = time.perf_counter()
        outs = [jfn(params, jax.random.PRNGKey(2 + i)) for i in range(iters)]
        for o in outs:
            np.asarray(o)
        return time.perf_counter() - start

    times = [block() for _ in range(windows)]
    tokens = batch * cfg.max_position_embeddings * iters
    return tokens / min(times), tokens / sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,64")
    ap.add_argument("--dtypes", default="f32,bf16")
    ap.add_argument("--windows", type=int, default=5)
    args = ap.parse_args()

    cfg = gpt.released_gpt_config(4096)
    params = gpt.init(jax.random.PRNGKey(0), cfg)
    trees = {}
    if "f32" in args.dtypes:
        trees["f32"] = jax.device_put(params)
    if "bf16" in args.dtypes:
        trees["bf16"] = jax.device_put(cast_floats(params, jnp.bfloat16))

    for batch in [int(b) for b in args.batches.split(",")]:
        for name, tree in trees.items():
            note(f"measuring {name} B={batch}")
            try:
                best, med = measure(tree, cfg, batch, windows=args.windows)
                print(
                    f"{name} B={batch}: best {best:.0f} tok/s  median {med:.0f} tok/s",
                    flush=True,
                )
            except Exception as e:
                print(f"{name} B={batch}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
