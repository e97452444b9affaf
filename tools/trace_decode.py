"""Capture an xplane trace of the fused decode program and print the top
device ops by self-time (tensorboard_plugin_profile's op-stats converter).

Round-5 directive #3: attribute the end-to-end-vs-pair-roofline gap inside
the device program op by op.

Usage: python tools/trace_decode.py [--rows 64] [--bucket 512]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np  # noqa: E402


def summarize(trace_dir: str, top: int = 25) -> None:
    xs = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                          recursive=True))
    if not xs:
        print("no xplane.pb found under", trace_dir)
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xs[-1]], "framework_op_stats^", {}
    )
    import gzip
    import io
    import json as _json

    try:
        payload = _json.loads(data)
    except Exception:
        payload = _json.loads(gzip.GzipFile(fileobj=io.BytesIO(data)).read())
    # payload: list of tables; first is by-op rows
    rows = payload[0]["p"] if isinstance(payload, list) else payload
    print(rows if top == 0 else None)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=64)
    p.add_argument("--bucket", type=int, default=512)
    p.add_argument("--trace_dir", default="/tmp/decode_trace")
    p.add_argument("--summarize_only", action="store_true")
    args = p.parse_args(argv)

    if not args.summarize_only:
        import jax
        import jax.numpy as jnp

        from protein_structure_tokenizer_tpu.models import vq3d
        from protein_structure_tokenizer_tpu.models.config import preset
        from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
        from protein_structure_tokenizer_tpu.runtime.runner import InferenceRunner

        cfg = preset(4096, 1)
        params = vq3d.init(jax.random.PRNGKey(0), cfg)
        runner = InferenceRunner(
            cfg, params, mesh_lib.make_mesh(), compute_dtype=jnp.bfloat16
        )
        df = cfg.data.downsampling_ratio
        rng = np.random.RandomState(0)
        seqs = [
            rng.randint(0, cfg.fsq.num_codes, size=(args.bucket // df,))
            for _ in range(args.rows)
        ]
        ids = runner.pad_token_rows(seqs, effective_len=args.bucket // df)
        fn = lambda: runner.decode_tokens_fn(runner.params, jnp.asarray(ids))  # noqa: E731
        np.asarray(fn()["backbone_positions"])  # compile + warm
        os.makedirs(args.trace_dir, exist_ok=True)
        with jax.profiler.trace(args.trace_dir):
            outs = [fn() for _ in range(3)]
            for o in outs:
                np.asarray(o["backbone_positions"])
    summarize(args.trace_dir)


if __name__ == "__main__":
    main()
