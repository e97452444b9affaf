"""Device-time measurement helper for the tunneled TPU.

``block_until_ready`` through the tunnel returns before remote execution
finishes, so wall-clock timing of M pipelined dispatches followed by ONE
host fetch is the reliable estimator:

    dev_time ~= (t(M dispatches + fetch) - t(1 dispatch + fetch)) / (M - 1)

The single-dispatch term subtracts the RPC latency + fetch cost.
"""
import time

import numpy as np


def _sync(out):
    """Fetch a tiny slice that depends on ``out`` — forces execution to
    complete with a few-byte transfer instead of the full buffer."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


def device_time(fn, *args, iters: int = 11, reps: int = 1) -> float:
    """Median-of-reps device seconds per call of jitted ``fn(*args)``."""
    _sync(fn(*args))  # compile + warm
    estimates = []
    for _rep in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        tm = time.perf_counter() - t0
        estimates.append((tm - t1) / (iters - 1))
    return float(np.median(estimates))
