"""A/B: GPT generate bf16 vs weight-only int8 (lm.quant) under the bench
protocol (cache_segment, async-copy compiler option, best-of-windows).

Usage: python tools/bench_int8_ab.py [--batches 16,128]
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

from protein_structure_tokenizer_tpu.lm import gpt, quant, sampling
from protein_structure_tokenizer_tpu.runtime.precision import cast_floats

T0 = time.monotonic()


def note(msg):
    print(f"# [{time.monotonic() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def measure(params, cfg, batch, windows=5, iters=3, int8_kv=False):
    # per-recipe segment optima (docs/PERFORMANCE.md KV-segment re-tune)
    seg = (128 if batch <= 32 else 64) if int8_kv else 64
    lowered = jax.jit(
        lambda p, k: sampling.generate(
            p, cfg, k, batch, cfg.max_position_embeddings,
            use_cache=True, cache_segment=seg, int8_kv=int8_kv,
        )
    ).lower(params, jax.random.PRNGKey(1))
    try:
        jfn = lowered.compile(
            compiler_options={"xla_tpu_async_copy_bandwidth_scaling_factor": "0.1"}
        )
    except Exception:
        jfn = lowered.compile()
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
    ap.add_argument("--batches", default="16,128")
    args = ap.parse_args()

    cfg = gpt.released_gpt_config(4096)
    base = gpt.fuse_qkv_params(
        cast_floats(gpt.init(jax.random.PRNGKey(0), cfg), jnp.bfloat16), cfg
    )
    qparams = jax.device_put(quant.quantize_gpt_params_int8(base))
    variants = {
        "bf16": (jax.device_put(base), False),
        "int8": (qparams, False),
        "int8+kv8": (qparams, True),
    }
    for batch in [int(b) for b in args.batches.split(",")]:
        for name, (params, kv8) in variants.items():
            best, med = measure(params, cfg, batch, int8_kv=kv8)
            print(f"{name} B={batch}: best {best:.0f} tok/s, median {med:.0f}",
                  flush=True)


if __name__ == "__main__":
    main()
