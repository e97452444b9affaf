"""Decode end-to-end dispatch-gap diagnosis (round-5 directive #3).

The per-op trace says the decode device kernels sit at ~80% of the HBM
roofline, but end-to-end bench runs deliver only 20-25% of the analytic
bound — a 3-4x gap attributed to dispatch latency, host work, and
inter-dispatch gaps.  This tool measures where those milliseconds actually
go on the real chip:

  * enqueue cost per dispatch (host time spent in dispatch_decode),
  * wall time for K dispatches enqueued-then-drained (device-bound if
    enqueue is cheap; host-bound if the enqueue loop IS the wall time),
  * fused decode-from-tokens program vs the unfused 3-transfer/2-dispatch
    path (A/B at the same shapes),
  * sensitivity to the number of in-flight dispatches.

Usage:  python tools/diag_decode.py [--rows 64] [--bucket 512] [--iters 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=64)
    p.add_argument("--bucket", type=int, default=512)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--backend", default=None)
    args = p.parse_args(argv)

    from protein_structure_tokenizer_tpu.cli.common import force_backend

    force_backend(args.backend)

    import jax
    import jax.numpy as jnp

    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.models.config import preset
    from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
    from protein_structure_tokenizer_tpu.runtime import runner as runner_mod
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

    def unfused_dispatch(ids):
        tm = runner_mod.build_tokens_mask_from_sequence(ids, cfg.data.pad_token_id)
        nm = runner_mod.build_nodes_mask_from_tokens_mask(tm, df)
        q = runner.indexes_to_codes_fn(jnp.asarray(ids))
        return runner.decode_fn(
            runner.params,
            jnp.asarray(q),
            jnp.asarray(nm[..., None], dtype=jnp.float32),
            jnp.asarray(tm[..., None], dtype=jnp.float32),
        )

    def fused_dispatch(ids):
        return runner.decode_tokens_fn(runner.params, jnp.asarray(ids))

    report = {"rows": args.rows, "bucket": args.bucket, "iters": args.iters}

    # warm both programs
    for fn in (fused_dispatch, unfused_dispatch):
        np.asarray(fn(ids)["backbone_positions"])

    for name, fn in (("fused", fused_dispatch), ("unfused", unfused_dispatch)):
        best = None
        for _ in range(3):
            # (a) enqueue-only loop timing
            t0 = time.perf_counter()
            enq_ts = []
            outs = []
            for _ in range(args.iters):
                s = time.perf_counter()
                outs.append(fn(ids))
                enq_ts.append(time.perf_counter() - s)
            t_enqueued = time.perf_counter() - t0
            # (b) drain
            drain_ts = []
            for o in outs:
                s = time.perf_counter()
                np.asarray(o["backbone_positions"])
                drain_ts.append(time.perf_counter() - s)
            t_total = time.perf_counter() - t0
            entry = {
                "enqueue_ms_per_dispatch": round(1e3 * float(np.mean(enq_ts)), 2),
                "enqueue_ms_each": [round(1e3 * t, 2) for t in enq_ts],
                "t_enqueue_all_s": round(t_enqueued, 4),
                "t_total_s": round(t_total, 4),
                "first_drain_ms": round(1e3 * drain_ts[0], 2),
                "drain_ms_each": [round(1e3 * t, 2) for t in drain_ts],
                "ms_per_dispatch_wall": round(1e3 * t_total / args.iters, 2),
            }
            if best is None or entry["t_total_s"] < best["t_total_s"]:
                best = entry
        report[name] = best
        print(name, json.dumps(best), flush=True)

    # (c) in-flight window sensitivity: window w keeps at most w dispatches
    # outstanding (the runner's pipeline_depth semantics).
    windows = {}
    for w in (1, 2, 3, 4, 8):
        from collections import deque

        best_w = None
        for _ in range(3):
            q = deque()
            t0 = time.perf_counter()
            for _ in range(args.iters):
                q.append(fused_dispatch(ids))
                if len(q) >= w:
                    np.asarray(q.popleft()["backbone_positions"])
            while q:
                np.asarray(q.popleft()["backbone_positions"])
            dt = time.perf_counter() - t0
            if best_w is None or dt < best_w:
                best_w = dt
        windows[w] = round(1e3 * best_w / args.iters, 2)
        print(f"window={w}: {windows[w]} ms/dispatch", flush=True)
    report["window_ms_per_dispatch"] = windows

    # roofline context
    from protein_structure_tokenizer_tpu.utils import roofline

    bytes_lb = roofline.decode_pair_bytes(
        args.rows, args.bucket,
        pair_dim=cfg.decoder.pair_representation.output_dim,
        itemsize=2,
        num_fold_iterations=cfg.structure_module.num_layer,
    )
    floor_ms = 1e3 * bytes_lb / (roofline.PEAK_HBM_GBS * 1e9)
    report["hbm_floor_ms_per_dispatch"] = round(floor_ms, 2)
    best_ms = min(windows.values())
    report["pct_hbm_roofline_best"] = round(100 * floor_ms / best_ms, 1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
