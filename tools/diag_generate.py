"""Diagnose the per-step cost structure of KV-cached generation:
per-step ms vs block length (cache-read scaling) and vs batch (overhead
amortization).  If per-step time barely drops at short blocks, the loop is
op-overhead-bound, not HBM-bound."""
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


cfg = gpt.released_gpt_config(4096)
params = jax.device_put(
    cast_floats(gpt.init(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
)

for batch, block in [(16, 514), (16, 256), (16, 64), (64, 514), (128, 514)]:
    jfn = jax.jit(
        lambda p, k, b=batch, n=block: sampling.generate(
            p, cfg, k, b, n, use_cache=True
        )
    )
    try:
        t = time.monotonic()
        np.asarray(jfn(params, jax.random.PRNGKey(1)))
        note(f"B={batch} block={block}: compiled+warm {time.monotonic()-t:.1f}s")
        times = []
        for i in range(4):
            start = time.perf_counter()
            np.asarray(jfn(params, jax.random.PRNGKey(2 + i)))
            times.append(time.perf_counter() - start)
        best = min(times)
        print(
            f"B={batch:4d} block={block:4d}: {best*1e3/block:7.3f} ms/step  "
            f"{batch*block/best:8.0f} tok/s",
            flush=True,
        )
    except Exception as e:
        print(f"B={batch} block={block}: FAILED {type(e).__name__}: {e}", flush=True)
