"""Same-run decode A/B: f32 vs bf16, B=32 vs 64, XLA vs fused pair kernel.

All variants timed inside ONE process on the same chip so the ~2x run-to-run
backend weather cancels out of every ratio.  Each variant: one 512-bucket
batch, best + median of 5 windows x 2 dispatches, honest host-fetch
barriers.
"""
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

from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import preset
from protein_structure_tokenizer_tpu.runtime.precision import mixed_precision_policy

T0 = time.monotonic()


def note(msg):
    print(f"# [{time.monotonic() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


cfg = preset(4096, 1)
params = jax.device_put(vq3d.init(jax.random.PRNGKey(0), cfg))
N, T = 512, 512
rng = np.random.RandomState(0)


def build(batch, dtype, use_pallas):
    def impl(p, q, nm, tm):
        out = vq3d.decode_and_make_structure(
            p, cfg, q, nm, tm, use_pallas=use_pallas
        )
        return out["final_atom_positions"][..., :5, :]

    if dtype == "bf16":
        impl = mixed_precision_policy(impl, jnp.bfloat16)
    q = jnp.asarray(rng.randn(batch, T, len(cfg.fsq.levels)).astype(np.float32))
    nm = jnp.ones((batch, N, 1), jnp.float32)
    tm = jnp.ones((batch, T, 1), jnp.float32)
    return jax.jit(impl), (params, q, nm, tm)


def measure(label, batch, dtype, use_pallas=False):
    try:
        fn, args = build(batch, dtype, use_pallas)
        t = time.monotonic()
        np.asarray(fn(*args))
        note(f"{label}: compiled+warm {time.monotonic()-t:.1f}s")
        times = []
        for _ in range(5):
            s = time.perf_counter()
            outs = [fn(*args) for _ in range(2)]
            for o in outs:
                np.asarray(o)
            times.append(time.perf_counter() - s)
        times.sort()
        res = batch * N * 2
        print(
            f"{label}: best {res/times[0]:8.0f} res/s  median {res/times[2]:8.0f} res/s",
            flush=True,
        )
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


measure("f32  B=32 xla   ", 32, "f32")
measure("bf16 B=32 xla   ", 32, "bf16")
measure("bf16 B=64 xla   ", 64, "bf16")
measure("bf16 B=64 pallas", 64, "bf16", use_pallas=True)
measure("bf16 B=32 pallas", 32, "bf16", use_pallas=True)
