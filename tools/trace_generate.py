"""Trace the int8 B=16 cached-generation step and print per-op totals.

Round-5 directive #7: int8 B=16 runs at ~36% of its HBM bound
(1.94 ms/step); attribute the non-roofline milliseconds op-by-op.

Usage: python tools/trace_generate.py [--batch 16] [--tokens 64] [--int8]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np  # noqa: E402


def summarize(trace_dir: str, n_steps: int, top: int = 30) -> None:
    js = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                          recursive=True))
    if not js:
        print("no trace found under", trace_dir)
        return
    d = json.loads(gzip.open(js[-1]).read())
    ev = d["traceEvents"]
    dev_pid = None
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name" and \
                "TPU" in str(e.get("args", {}).get("name", "")):
            dev_pid = e["pid"]
    tot, cnt = collections.Counter(), collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") == dev_pid:
            tot[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    print(f"device rows, per {n_steps}-step program (us/step in parens):")
    for name, dur in tot.most_common(top):
        print(f"{dur/1e3:9.2f} ms x{cnt[name]:<6} ({dur/n_steps:7.1f} us/step) {name[:80]}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--tokens", type=int, default=64)
    p.add_argument("--int8", action="store_true", default=True)
    p.add_argument("--trace_dir", default="/tmp/gen_trace")
    p.add_argument("--summarize_only", action="store_true")
    args = p.parse_args(argv)

    if not args.summarize_only:
        import jax
        import jax.numpy as jnp

        from protein_structure_tokenizer_tpu.lm import gpt, quant, sampling
        from protein_structure_tokenizer_tpu.runtime.precision import cast_floats

        cfg = gpt.released_gpt_config(4096)
        params = jax.device_put(
            cast_floats(gpt.init(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
        )
        if args.int8:
            params = jax.device_put(quant.quantize_gpt_params_int8(params))
        fn = jax.jit(
            lambda p, k: sampling.generate(
                p, cfg, k, args.batch, args.tokens, use_cache=True,
                int8_kv=args.int8,
            )
        )
        np.asarray(fn(params, jax.random.PRNGKey(1)))  # compile+warm
        os.makedirs(args.trace_dir, exist_ok=True)
        with jax.profiler.trace(args.trace_dir):
            np.asarray(fn(params, jax.random.PRNGKey(2)))
    summarize(args.trace_dir, args.tokens)


if __name__ == "__main__":
    main()
