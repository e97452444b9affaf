"""Benchmark: the three BASELINE workloads on the real chip.

Prints one JSON line per workload.  The HEADLINE tokenize metric is emitted
FIRST (insurance: if the driver's wall-clock budget expires mid-run, a valid
line already exists); after EVERY completed stage the insurance block
re-emits ALL metrics completed so far with the tokenize headline LAST, so
the driver-recorded tail always contains every number the round claims:

    {"metric": "casp14_tokenize_residues_per_sec_per_chip", ...}   <- insurance
    {"metric": "casp14_decode_residues_per_sec_per_chip", ...}
    ... stages ...
    {"metric": "casp14_decode_residues_per_sec_per_chip", ...}     <- re-emitted
    {"metric": "gpt_generate_tokens_per_sec_per_chip", ...}        <- re-emitted
    {"metric": "casp14_tokenize_residues_per_sec_per_chip", ...}   <- recorded

Every optional stage checks a wall-clock budget (PST_BENCH_BUDGET_S, default
1500 s) before starting and is SKIPPED — never hung — when the remaining time
cannot plausibly cover a cold compile of that stage.

vs_baseline compares against the *reference implementation* (pmap/haiku,
/root/reference) executing the same workload on the same hardware; reference
numbers are cached in bench_baseline.json (committed, so a driver run never
spends its budget measuring the reference).  Each committed baseline is the
MOST FAVORABLE value the reference measured across protocols and runs on
this ~2x-variance backend — the conservative denominator for our speedup
claims (tokenize: 4,437.7 from a B=256 single-batch run; re-measurements at
the batch sizes that still fit HBM today gave 1.2-2.0k).  A missing
baseline emits ``vs_baseline: null`` — "unmeasured", never a fabricated 1.0.
The generate baseline is the reference's own haiku GPT stack (built via
tests/refsupport) running its full-block-re-forward-per-token algorithm
(generation_utils.py:26-58, no KV cache, gpt_layer.py:272-275) under the
same best-of-windows timing as our side: 221.4 tokens/s/chip (an earlier
committed 9.2 was a stalled first-window measurement).

Missing baselines are measured by a SUBPROCESS (``--measure-reference``)
killed after REF_TIMEOUT_S: the reference's per-sample haiku decode stack can
take >10 min of XLA compile on this backend, and a hung baseline must never
stop the headline numbers from being reported.  The subprocess runs before
this process touches the TPU (two processes cannot share the chip).
"""
import glob
import json
import os
import sys
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "tests", "refsupport"))

# The axon backend's remote XLA/Mosaic compiles are slow (minutes per program,
# high variance) — keep a persistent compilation cache next to the repo (and
# COMMITTED, so even a fresh clone skips the cold compiles; entries are keyed
# on backend+jaxlib+HLO hashes, so a stale cache silently falls back to
# compiling rather than misbehaving).
_CACHE_DIR = os.environ.get(
    "PST_JAX_CACHE_DIR", os.path.join(REPO_ROOT, ".jax_cache")
)
if _CACHE_DIR:
    import jax

    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    # Cache EVERYTHING: on this backend even the sub-second param-init
    # programs cost a multi-second remote-compile round trip each.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

CASP14_DIR = "/root/reference/casp14_pdbs"
BASELINE_CACHE = os.path.join(REPO_ROOT, "bench_baseline.json")
# Rows per dispatch amortize the tunneled chip's per-dispatch latency
# (~25-50 ms; device encode itself is ~10-33 ms per 64 rows, so latency —
# not compute — bounds small dispatches).  Sorted-by-length chunks keep most
# batches in a sub-512 bucket.
SUB_BATCH = int(os.environ.get("PST_BENCH_SUB_BATCH", "64"))  # rows/dispatch
BATCH = int(os.environ.get("PST_BENCH_BATCH", "256"))  # total rows
# Rows/dispatch at the 512 bucket: this A/B flips with traffic changes —
# pre-kernel 85.3k @32 vs 71.8k @64; post-IPA-softmax-kernel 113.9k @64 vs
# 110.6k @32; after round 5's bf16-only probability copy + bf16 raw-logits
# store, a SYNTHETIC all-512 A/B favors 32 again (155.4k vs 150.4k padded
# res/s) but the real mixed-length CASP14 corpus (adaptive rows per bucket)
# measured better at 64: 171.0k best / 170.8k median vs 168.7k / 161.2k —
# so the corpus-level evidence keeps 64.
DECODE_SUB = int(os.environ.get("PST_BENCH_DECODE_SUB", "64"))
DECODE_BATCHES = 4
TIMED_ITERS = int(os.environ.get("PST_BENCH_ITERS", "3"))
# The tunneled chip's delivered throughput swings ~2x run to run (same code,
# warm cache: decode measured 35-77k res/s across same-day runs).  Each
# workload therefore times TIMED_WINDOWS whole blocks and reports the best —
# the block least perturbed by tunnel/host interference.
TIMED_WINDOWS = int(os.environ.get("PST_BENCH_WINDOWS", "5"))


def best_window(run_block) -> float:
    """Run ``run_block()`` TIMED_WINDOWS times; return the fastest elapsed."""
    return min(run_block() for _ in range(TIMED_WINDOWS))


def window_stats(run_block) -> tuple:
    """(best, median) elapsed over TIMED_WINDOWS runs of ``run_block()``.

    Best = the window least perturbed by tunnel/host interference (the
    headline protocol); median = the robust center, emitted alongside so
    round-over-round deltas are distinguishable from the backend's ~2x
    delivered-throughput weather."""
    times = sorted(run_block() for _ in range(TIMED_WINDOWS))
    return times[0], times[len(times) // 2]

# Wall-clock discipline: emit whatever is measured, skip what will not fit.
BUDGET_S = float(os.environ.get("PST_BENCH_BUDGET_S", "1500"))
# Minimum remaining budget to even START a stage (covers a cold compile of
# that stage on this backend; warm-cache runs take a small fraction of this).
STAGE_MIN_S = {
    "decode": float(os.environ.get("PST_BENCH_DECODE_MIN_S", "420")),
    "generate": float(os.environ.get("PST_BENCH_GENERATE_MIN_S", "360")),
    "variants": float(os.environ.get("PST_BENCH_VARIANTS_MIN_S", "300")),
}
# The released-size KV-cache generate scan can take many minutes of remote
# XLA compile COLD on this backend (warm: seconds via the committed
# .jax_cache).  A marker dropped after the first successful compile tells
# later runs the cache is warm; the marker is only trusted when it was
# written under the SAME jax/jaxlib/backend (cache keys include those, so a
# version bump means every committed entry misses and the compile is cold
# again despite the marker).
GENERATE_COLD_S = float(os.environ.get("PST_BENCH_GENERATE_COLD_S", "2400"))
_GEN_WARM_MARKER = os.path.join(_CACHE_DIR or "/tmp", ".pst_generate_compiled")


def _cache_fingerprint() -> str:
    import jax
    import jaxlib

    return f"{jax.__version__}/{jaxlib.__version__}/{jax.default_backend()}"


def _generate_cache_warm() -> bool:
    if not _CACHE_DIR or not os.path.exists(_GEN_WARM_MARKER):
        return False
    try:
        with open(_GEN_WARM_MARKER) as f:
            return f.read().strip() == _cache_fingerprint()
    except OSError:
        return False


def _mark_generate_warm() -> None:
    with open(_GEN_WARM_MARKER, "w") as f:
        f.write(_cache_fingerprint())
_T0 = time.monotonic()

# TPU v5e (v5 lite) peaks, for the absolute-terms roofline lines.
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_GBS = 819.0


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _note(msg: str) -> None:
    print(f"# [{time.monotonic() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def featurize_corpus():
    from protein_structure_tokenizer_tpu.data.featurize import make_graph_from_pdb
    from protein_structure_tokenizer_tpu.runtime.runner import collate_graphs
    import dataclasses

    paths = sorted(glob.glob(os.path.join(CASP14_DIR, "*.pdb")))
    graphs, kept = [], []
    for p in paths:
        try:
            graphs.append(dataclasses.asdict(make_graph_from_pdb(p)))
            kept.append(p)
        except NotImplementedError:
            continue
    while len(graphs) < BATCH:
        graphs.append(graphs[len(graphs) % len(kept)])
    graphs = graphs[:BATCH]
    batch = collate_graphs(graphs)
    valid_residues = int(np.asarray(batch.nodes_mask).sum())
    return batch, valid_residues


def _tokenize_model_costs(cfg, params, device_batches) -> tuple:
    """Analytic (FLOPs, HBM-byte lower bound) for one pass over the batches.

    FLOPs are counted from the jaxpr of the canonical DENSE path
    (use_pallas=False) — identical math regardless of which kernel schedule
    executed — fixing the round-3 artifact where ``cost_analysis()`` could
    not see FLOPs done inside Pallas kernels (the recorded "2.16% MFU"
    halved whenever a kernel toggled).  Bytes: utils/roofline.py formulas.
    """
    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.utils import roofline

    def dense_tokenize(p, graph):
        return vq3d.encode_and_quantize(
            p, cfg, graph, compute_usage=False, use_pallas=False
        )["tokens"]

    flops = bytes_lb = 0.0
    counted = {}
    for db in device_batches:
        rows, n_nodes = np.asarray(db.nodes_mask).shape[:2]
        key = (rows, n_nodes)
        if key not in counted:
            counted[key] = roofline.count_matmul_flops(dense_tokenize, params, db)
        flops += counted[key]
        bytes_lb += roofline.tokenize_edge_bytes(
            rows, n_nodes,
            k=cfg.data.graph_max_neighbor,
            hidden=cfg.encoder.gnn.hidden_dimension,
            num_layers=cfg.encoder.gnn.gnn_number_layers,
        )
    return flops, bytes_lb


def _emit_roofline(prefix: str, flops: float, bytes_lb: float, elapsed: float,
                   n_chips: int = 1) -> None:
    """Per-workload absolute-performance lines from the ANALYTIC model:
    identical numerators no matter which kernel path ran."""
    from protein_structure_tokenizer_tpu.utils import roofline

    tflops = flops / elapsed / 1e12 / n_chips
    _emit(f"{prefix}_achieved_tflops_per_sec_per_chip", "TFLOP/s/chip", tflops, None)
    _emit(
        f"{prefix}_pct_mxu_roofline", "%",
        100.0 * tflops * 1e12 / roofline.PEAK_BF16_FLOPS, None,
    )
    if bytes_lb:
        _emit(
            f"{prefix}_pct_hbm_roofline", "%",
            100.0 * bytes_lb / elapsed / n_chips / (roofline.PEAK_HBM_GBS * 1e9),
            None,
        )


def bench_ours():
    """Tokenize the corpus the way runner.tokenize does: rows sorted by
    length into SUB_BATCH-row batches, each padded to the smallest length
    bucket that fits (the reference always pads to 512 — on CASP14 that is
    ~2.8x padding FLOPs).  Featurization is untimed on both sides; the timed
    loop keeps every batch's dispatch in flight and fetches all results."""
    import dataclasses as _dc

    import jax

    from protein_structure_tokenizer_tpu.data.featurize import make_graph_from_pdb
    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.models.config import preset
    from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
    from protein_structure_tokenizer_tpu.runtime.runner import (
        InferenceRunner,
        collate_graphs,
        pad_tokens_axis,
    )

    cfg = preset(4096, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    n_chips = len(jax.devices())
    runner = InferenceRunner(cfg, params, mesh_lib.make_mesh())
    buckets = runner.length_buckets or (cfg.data.seq_max_size,)

    lengths = _corpus_lengths()
    kept = sorted(lengths, key=lambda q: lengths[q])
    rows = [kept[i % len(kept)] for i in range(BATCH)]
    rows.sort(key=lambda q: lengths[q])

    device_batches, total_valid = [], 0
    for i in range(0, BATCH, SUB_BATCH):
        chunk = rows[i : i + SUB_BATCH]
        longest = max(lengths[q] for q in chunk)
        bucket = next((b for b in buckets if b >= longest), cfg.data.seq_max_size)
        graphs = [
            _dc.asdict(make_graph_from_pdb(q, padding_num_residue=bucket))
            for q in chunk
        ]
        local = pad_tokens_axis(collate_graphs(graphs), cfg.down_sampler.max_out_len)
        total_valid += int(np.asarray(local.nodes_mask).sum())
        device_batches.append(mesh_lib.shard_batch(runner.mesh, local))

    # Compile + warmup every bucket shape; fetch to host — on the tunneled
    # backend only a host fetch reliably waits for completion.  Each shape is
    # compiled ONCE via lower().compile() and the timed loop calls the
    # compiled executables directly.
    compiled_batches = []
    for db in device_batches:
        compiled = runner.tokenize_fn.lower(runner.params, db).compile()
        compiled_batches.append((compiled, db))
        np.asarray(compiled(runner.params, db)["tokens"])
    # Analytic FLOP/byte model (path-independent; host-side tracing only).
    total_flops, total_bytes = _tokenize_model_costs(cfg, params, device_batches)
    _note("tokenize: compiled+warm")

    # Keep all dispatches in flight, then force a host fetch of every
    # result: on the tunneled TPU backend block_until_ready alone returns
    # early, so fetching the bytes is the only honest completion barrier.
    def block():
        start = time.perf_counter()
        outs = [
            compiled(runner.params, db)
            for _ in range(TIMED_ITERS)
            for compiled, db in compiled_batches
        ]
        for o in outs:
            np.asarray(o["tokens"])
        return time.perf_counter() - start

    best, median = window_stats(block)
    residues_per_sec = total_valid * TIMED_ITERS / best
    return {
        "value": residues_per_sec / n_chips,
        "median": total_valid * TIMED_ITERS / median / n_chips,
        "n_chips": n_chips,
        "flops": total_flops * TIMED_ITERS,
        "bytes": total_bytes * TIMED_ITERS,
        "elapsed": best,
    }


def load_baselines() -> dict:
    if os.path.exists(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            # A kill mid-write can leave a torn file; treat as empty rather
            # than making every subsequent bench run crash.
            return {}
    return {}


def save_baseline(key: str, value: float) -> None:
    data = load_baselines()
    data[key] = value
    tmp = BASELINE_CACHE + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f)
    os.replace(tmp, BASELINE_CACHE)


def bench_decode(lengths):
    """Decode CASP14-length token rows -> backbone structures, length-bucketed
    the way runner.decode_tokens does (the reference decodes every row at full
    512 padding, inference_runner.py:326-437).

    The bench decode runs the SHIPPING fast configuration: bf16 pair track
    (the f32 pair tensor is the HBM bound — bf16 halves the traffic; +38%
    in the same-run A/B) with the fused IPA-softmax kernel at
    B=DECODE_SUB=64 rows per 512 dispatch (adaptive: more rows at shorter
    buckets; corpus-level A/B kept 64 after round 5's kernel changes — see
    the DECODE_SUB comment).  Coordinate drift vs f32 is pinned per bucket in
    tests/test_precision.py; the conformance/CLI default stays full f32.
    """
    import jax
    import jax.numpy as jnp

    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.models.config import preset
    from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
    from protein_structure_tokenizer_tpu.runtime.runner import InferenceRunner
    from protein_structure_tokenizer_tpu.utils import roofline

    cfg = preset(4096, 1)
    params = vq3d.init(jax.random.PRNGKey(0), cfg)
    n_chips = len(jax.devices())
    runner = InferenceRunner(
        cfg, params, mesh_lib.make_mesh(), compute_dtype=jnp.bfloat16
    )
    buckets = runner.length_buckets or (cfg.data.seq_max_size,)
    df = cfg.data.downsampling_ratio

    rng = np.random.RandomState(0)
    seq_max = cfg.data.seq_max_size
    lens = sorted(lengths.values())
    rows = sorted(
        lens[i % len(lens)] for i in range(DECODE_SUB * DECODE_BATCHES)
    )
    # Same adaptive geometry as runner.decode_tokens: rows per dispatch
    # scale inversely with the bucket (constant device work per dispatch,
    # amortizing the ~25-50 ms per-dispatch tunnel latency on short chains).
    batches, total_valid = [], 0
    flops = bytes_lb = 0.0
    counted = {}
    i = 0
    while i < len(rows):
        bucket = next((b for b in buckets if b >= rows[i]), seq_max)
        sub = DECODE_SUB * max(1, seq_max // bucket)
        chunk = [n for n in rows[i : i + sub] if n <= bucket]
        i += len(chunk)
        seqs = [rng.randint(0, cfg.fsq.num_codes, size=(n // df,)) for n in chunk]
        while len(seqs) < sub:  # fill the tail: one batch shape per bucket
            seqs.append(seqs[len(seqs) % len(chunk)])
        ids = runner.pad_token_rows(seqs, effective_len=bucket // df)
        total_valid += sum(len(s) * df for s in seqs)
        batches.append(ids)
        key = (sub, bucket)
        if key not in counted:
            counted[key] = _decode_model_flops(cfg, params, runner, ids)
        flops += counted[key]
        bytes_lb += roofline.decode_pair_bytes(
            sub, bucket,
            pair_dim=cfg.decoder.pair_representation.output_dim,
            itemsize=2,  # bf16 pair track on the bench path
            num_fold_iterations=cfg.structure_module.num_layer,
        )

    for ids in batches:  # compile + warm each bucket
        _, out = runner.dispatch_decode(ids)
        np.asarray(out["backbone_positions"])
    _note("decode: compiled+warm")

    def block():
        start = time.perf_counter()
        outs = [
            runner.dispatch_decode(ids)[1]
            for _ in range(TIMED_ITERS)
            for ids in batches
        ]
        for o in outs:
            np.asarray(o["backbone_positions"])
        return time.perf_counter() - start

    best, median = window_stats(block)
    ref = load_baselines().get("reference_decode_residues_per_sec_per_chip")
    return {
        "value": total_valid * TIMED_ITERS / best / n_chips,
        "median": total_valid * TIMED_ITERS / median / n_chips,
        "n_chips": n_chips,
        "flops": flops * TIMED_ITERS,
        "bytes": bytes_lb * TIMED_ITERS,
        "elapsed": best,
        "ref": ref,
    }


def _decode_model_flops(cfg, params, runner, ids) -> float:
    """Analytic matmul FLOPs of one decode dispatch, counted on the dense
    path (use_pallas=False) — independent of the executed kernel schedule."""
    import jax.numpy as jnp

    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.utils import roofline

    rows, t = np.asarray(ids).shape
    df = cfg.data.downsampling_ratio
    n = t * df
    quantized = jnp.zeros((rows, t, len(cfg.fsq.levels)), jnp.float32)
    nodes_mask = jnp.ones((rows, n, 1), jnp.float32)
    tokens_mask = jnp.ones((rows, t, 1), jnp.float32)

    def dense_decode(p, q, nm, tm):
        return vq3d.decode_and_make_structure(
            p, cfg, q, nm, tm, use_pallas=False
        )["final_atom_positions"]

    return roofline.count_matmul_flops(
        dense_decode, params, quantized, nodes_mask, tokens_mask
    )


def _bench_decode_reference(row_lengths, params_seed: int = 0):
    """Reference decode_and_make_structure via pmap at full 512 padding.

    Fairness: decodes the SAME full row-length distribution bench_decode
    times on our side (DECODE_SUB-row batches covering every row, not just
    the shortest ones), and uses the same best-of-TIMED_WINDOWS protocol —
    both sides of the ratio see identical workloads and identical timing
    discipline on this noisy backend."""
    try:
        from refmodel import import_reference, load_reference_config

        import_reference()
        import haiku as hk
        import jax
        import jax.numpy as jnp

        cfg = load_reference_config(4096, 1)
        from structure_tokenizer.model.model import Vq3D

        devices = jax.devices()[:1]
        seq_max = cfg.data.data.seq_max_size
        sub = DECODE_SUB
        rng = np.random.RandomState(0)

        def dec(q, nm, tm):
            return Vq3D(config=cfg.model, global_config=cfg.data).decode_and_make_structure(
                q, nm, tm, is_training=False, safe_key=None
            )

        transformed = hk.transform(dec)
        apply = jax.pmap(transformed.apply, devices=devices, axis_name="p")

        emb_dim = cfg.model.model.down_proj.emb_dim
        key = jax.random.PRNGKey(params_seed)
        batches, valid = [], 0.0
        for start_row in range(0, len(row_lengths), sub):
            chunk = row_lengths[start_row : start_row + sub]
            if len(chunk) < sub:
                chunk = list(chunk) + list(row_lengths[: sub - len(chunk)])
            q = rng.randn(1, sub, seq_max, emb_dim).astype(np.float32)
            nm = np.zeros((1, sub, seq_max, 1), np.float32)
            for i, n in enumerate(chunk):
                nm[0, i, :n] = 1.0
            batches.append((q, nm, nm.copy()))
            valid += float(nm.sum())
        params = transformed.init(
            key,
            jnp.asarray(batches[0][0][0, :1]),
            jnp.asarray(batches[0][1][0, :1]),
            jnp.asarray(batches[0][2][0, :1]),
        )
        params = jax.device_put_replicated(params, devices)
        keys = jax.random.split(key, len(devices))
        out = apply(params, keys, *batches[0])
        np.asarray(out["final_atom_positions"])

        def block():
            start = time.perf_counter()
            outs = [
                apply(params, keys, q, nm, tm)
                for _ in range(TIMED_ITERS)
                for q, nm, tm in batches
            ]
            for o in outs:
                np.asarray(o["final_atom_positions"])
            return time.perf_counter() - start

        # The reference decodes ALL padded rows; per-second rate counted on
        # the same valid residues as ours for a like-for-like ratio.
        return valid * TIMED_ITERS / best_window(block)
    except Exception as e:
        print(f"# reference decode baseline unavailable: {type(e).__name__}: {e}", file=sys.stderr)
        return None


GENERATE_THROUGHPUT_BATCH = int(os.environ.get("PST_BENCH_GEN_TP_BATCH", "128"))


def bench_generate():
    """Released-size GPT sampling (20L/1024d, 514-token block): KV-cached
    lax.scan loop vs the reference's haiku stack (full-block re-forward per
    step, generation_utils.py:26-58).

    The bench runs the SHIPPING fast configuration (each piece measured on
    this chip, tools/bench_generate_ab.py + docs/PERFORMANCE.md):

      * bf16 parameters + bf16 KV cache, f32 softmax/LN/logits islands
        (distribution equivalence pinned in tests/test_gpt.py): 2,536 ->
        3,585 tok/s at B=16;
      * ``xla_tpu_async_copy_bandwidth_scaling_factor=0.1``: stops XLA's
        memory-space assignment from round-tripping ~22 cache buffers per
        step through VMEM (34% of device time as pure copies in the r3
        profile): -> 4,571;
      * ``cache_segment=64`` growing KV cache + fused qkv projection:
        -> ~5,200 at B=16, ~17,000 at B=128.

    Two lines: the B=16 protocol metric (vs the reference baseline at B=16),
    and a throughput-mode line at B=GENERATE_THROUGHPUT_BATCH.
    """
    import jax
    import jax.numpy as jnp

    from protein_structure_tokenizer_tpu.lm import gpt, sampling
    from protein_structure_tokenizer_tpu.runtime.precision import cast_floats
    from protein_structure_tokenizer_tpu.utils import roofline

    cfg = gpt.released_gpt_config(4096)
    params = gpt.fuse_qkv_params(
        cast_floats(gpt.init(jax.random.PRNGKey(0), cfg), jnp.bfloat16), cfg
    )
    params = jax.device_put(params)
    n_chips = len(jax.devices())
    # KV-segment optima from same-run A/Bs (docs/PERFORMANCE.md): bf16 wants
    # seg=64 at every batch (B=128: 19.3k vs 17.6k at seg=128); int8 flips —
    # the halved cache traffic makes segment-boundary overhead dominate at
    # small batch (B=16: 8.3k at seg=128 vs 7.4k at 64) while large batch
    # stays traffic-bound (B=128: 29.0k at seg=64 vs 26.6k at 128).
    def seg_of(batch, int8_kv=False):
        if int8_kv:
            return 128 if batch <= 32 else 64
        return 64

    def measure(batch, params_arg=None, int8_kv=False):
        pp = params if params_arg is None else params_arg
        # params MUST be a jit argument: closing over the ~124M-param tree
        # embeds it as constants in the HLO, and this backend's remote-
        # compile service drops the oversized program ("Broken pipe").
        lowered = jax.jit(
            lambda p, k: sampling.generate(
                p, cfg, k, batch, cfg.max_position_embeddings,
                use_cache=True, cache_segment=seg_of(batch, int8_kv),
                int8_kv=int8_kv,
            )
        ).lower(pp, jax.random.PRNGKey(1))
        try:
            jfn = lowered.compile(
                compiler_options={
                    "xla_tpu_async_copy_bandwidth_scaling_factor": "0.1"
                }
            )
        except Exception:  # unknown option on a future backend: still run
            jfn = lowered.compile()
        np.asarray(jfn(pp, jax.random.PRNGKey(1)))  # warm
        _note(f"generate B={batch}: compiled+warm")

        def block():
            start = time.perf_counter()
            outs = [
                jfn(pp, jax.random.PRNGKey(2 + i))
                for i in range(TIMED_ITERS)
            ]
            for o in outs:
                np.asarray(o)
            return time.perf_counter() - start

        best, median = window_stats(block)
        tokens = batch * cfg.max_position_embeddings * TIMED_ITERS
        return tokens / best / n_chips, tokens / median / n_chips, best

    ours, med, best_s = measure(16)
    ref = load_baselines().get("reference_generate_tokens_per_sec_per_chip")

    # Analytic roofline numerators for the B=16 protocol line.
    steps = cfg.max_position_embeddings
    flops = roofline.count_matmul_flops(
        lambda p, k: sampling.generate(
            p, cfg, k, 16, steps, use_cache=True, cache_segment=seg_of(16)
        ),
        params, jax.random.PRNGKey(0),
    )
    block_bytes = roofline.generate_block_bytes(
        params, cfg, 16, steps, segment=seg_of(16)
    )
    return {
        "value": ours,
        "median": med,
        "ref": ref,
        "flops": flops * TIMED_ITERS,
        "bytes": block_bytes * TIMED_ITERS,
        "elapsed": best_s,
        "measure": measure,
        "params": params,
    }


def _measure_generate_reference():
    """The reference's own haiku GPT stack (scripts/lm/gpt_model.py via
    tests/refsupport) running its released sampling algorithm: one pmap'd
    temperature-sampling update = one FULL forward over the 514-token block
    per generated token (generation_utils.py:26-58; no KV cache,
    gpt_layer.py:272-275).  Each update emits `batch` tokens, so
    tokens/s = batch / t_update; measured over several steps."""
    from refmodel import import_reference

    import_reference()
    import functools

    import haiku as hk
    import jax
    import jax.numpy as jnp

    from scripts.lm.generation_utils import update_tokens_ids_temperature_sampling
    from scripts.lm.gpt_model import GptConfig, build_gpt_fn

    cfg = GptConfig(
        vocab_size=4099,
        eos_token_id=4097,
        embed_dim=1024,
        ffn_embed_dim=4096,
        num_heads=16,
        num_layers=20,
        rope_dimensions=8,
        max_position_embeddings=514,
        add_bias_ffn=False,
        ffn_activation_name="swish",
        use_glu_in_ffn=True,
        add_bias_lm_head=False,
        use_gradient_checkpointing=False,
        norm_type="layer_norm",
        parallel_attention_ff=False,
        dropout_rate=0.0,
    )
    gpt_fn = hk.transform(build_gpt_fn(cfg))
    devices = jax.devices()[:1]
    batch = 16
    block_len = 514

    tokens = np.full((1, batch, block_len), 4096, dtype=np.int32)
    key = jax.random.PRNGKey(0)
    params = gpt_fn.init(key, jnp.asarray(tokens[0]))
    params = jax.device_put_replicated(params, devices)

    update = jax.pmap(
        functools.partial(
            update_tokens_ids_temperature_sampling,
            apply_fn=gpt_fn.apply,
            temperature=0.6,
        ),
        axis_name="p",
        devices=devices,
    )
    keys = jax.random.split(key, 1)
    t = jnp.asarray(tokens)

    def step(t, keys, i):
        ts = jax.device_put_replicated(jnp.asarray(i), devices=devices)
        return update(tokens_ids=t, time_step=ts, random_key=keys, params=params)

    t, keys = step(t, keys, 0)  # compile + warm
    np.asarray(t)
    steps = 8

    def block():
        nonlocal t, keys
        start = time.perf_counter()
        for i in range(1, steps + 1):
            t, keys = step(t, keys, i)
        np.asarray(t)
        return time.perf_counter() - start

    rate = batch * steps / best_window(block) / len(devices)
    save_baseline("reference_generate_tokens_per_sec_per_chip", rate)
    return rate


def bench_reference(batch, valid_residues):
    """Measure the reference pmap pipeline on the same device; cached."""
    cached = load_baselines().get("reference_residues_per_sec_per_chip")
    if cached is not None:
        return cached
    try:
        from refmodel import import_reference, load_reference_config

        import_reference()
        import haiku as hk
        import jax
        import jax.numpy as jnp

        cfg = load_reference_config(4096, 1)
        from structure_tokenizer.model.model import Vq3D
        from structure_tokenizer.types import ProteinGraph

        devices = jax.devices()[:1]

        def fn(graph):
            return Vq3D(config=cfg.model, global_config=cfg.data).encode_and_quantize(
                graph, is_training=False
            )

        transformed = hk.transform(fn)
        apply = jax.pmap(transformed.apply, devices=devices, axis_name="p")

        # SUB_BATCH-row pmap chunks, mirroring our dispatch geometry (and
        # the reference's own operating point — its CLI default is 16 rows
        # per device, tokenize_pdb.py); one B=256 pmap batch OOMs a 16 GB
        # chip on the quantizer's (B, N, K) diagnostic tensors.
        def chunk_graph(i):
            sl = slice(i, i + SUB_BATCH)
            return ProteinGraph(
                n_node=np.asarray(batch.n_node)[sl][None],
                n_edge=np.asarray(batch.n_edge)[sl][None],
                nodes_mask=np.asarray(batch.nodes_mask)[sl][None],
                nodes_original_coordinates=np.asarray(
                    batch.nodes_original_coordinates
                )[sl][None],
                node_features=np.asarray(batch.node_features)[sl][None],
                edge_features=np.asarray(batch.edge_features)[sl][None],
                tokens_mask=np.asarray(batch.tokens_mask)[sl][None],
                senders=np.asarray(batch.senders)[sl][None],
                receivers=np.asarray(batch.receivers)[sl][None],
            )

        chunks = [chunk_graph(i) for i in range(0, BATCH, SUB_BATCH)]
        key = jax.random.PRNGKey(0)
        single = jax.tree_util.tree_map(lambda x: jnp.asarray(x[:, :1]), chunks[0])
        pmean_orig = jax.lax.pmean
        jax.lax.pmean = lambda x, axis_name=None: x  # init traces outside pmap
        try:
            params = transformed.init(key, jax.tree_util.tree_map(lambda x: x[0], single))
        finally:
            jax.lax.pmean = pmean_orig
        params = jax.device_put_replicated(params, devices)
        keys = jax.random.split(key, len(devices))

        out = apply(params, keys, chunks[0])
        np.asarray(out["tokens"])

        def block():
            start = time.perf_counter()
            outs = [
                apply(params, keys, g) for _ in range(TIMED_ITERS) for g in chunks
            ]
            for o in outs:
                np.asarray(o["tokens"])
            return time.perf_counter() - start

        ref_rps = valid_residues * TIMED_ITERS / best_window(block)
        save_baseline("reference_residues_per_sec_per_chip", ref_rps)
        return ref_rps
    except Exception as e:  # reference may not run on this jax version/backend
        print(f"# reference baseline unavailable: {type(e).__name__}: {e}", file=sys.stderr)
        return None


def bench_variants():
    """BASELINE configs 3-4 sub-metrics: the 64k-codebook tokenizer, the
    df=2/4 downsampling variants, and one timed diagnostics run exercising
    the FSQ Pallas distance kernel at K=64000 (the reference's dominant FLOP
    when diagnostics are on, quantize.py:227-239).  Correctness for all of
    these is golden-pinned (test_variant_goldens.py, test_64k_variants.py);
    these lines add the previously-missing on-hardware throughput record.
    Headline metrics are unaffected."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from protein_structure_tokenizer_tpu.data.featurize import make_graph_from_pdb
    from protein_structure_tokenizer_tpu.models import fsq as fsq_lib
    from protein_structure_tokenizer_tpu.models import vq3d
    from protein_structure_tokenizer_tpu.models.config import preset
    from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
    from protein_structure_tokenizer_tpu.runtime.runner import (
        InferenceRunner,
        collate_graphs,
        pad_tokens_axis,
    )

    n_chips = len(jax.devices())
    lengths = _corpus_lengths()
    kept = sorted(lengths, key=lambda q: lengths[q])
    rows = [kept[i % len(kept)] for i in range(SUB_BATCH)]

    for tag, cb, df in (("64k_df1", 64000, 1), ("4k_df2", 4096, 2), ("4k_df4", 4096, 4)):
        if _remaining() < 150:
            _note(f"variants: {tag} SKIPPED ({_remaining():.0f}s left)")
            return
        cfg = preset(cb, df)
        params = vq3d.init(jax.random.PRNGKey(0), cfg)
        # Single full-padding bucket: one compile per variant.
        runner = InferenceRunner(
            cfg, params, mesh_lib.make_mesh(), length_buckets=None
        )
        graphs = [
            _dc.asdict(
                make_graph_from_pdb(
                    q,
                    num_neighbor=cfg.data.graph_max_neighbor,
                    downsampling_ratio=df,
                    padding_num_residue=cfg.data.seq_max_size,
                )
            )
            for q in rows
        ]
        batch = pad_tokens_axis(collate_graphs(graphs), cfg.down_sampler.max_out_len)
        valid = int(np.asarray(batch.nodes_mask).sum())
        db = mesh_lib.shard_batch(runner.mesh, batch)
        np.asarray(runner.tokenize_fn(runner.params, db)["tokens"])  # warm

        def tok_block():
            start = time.perf_counter()
            outs = [
                runner.tokenize_fn(runner.params, db) for _ in range(TIMED_ITERS)
            ]
            for o in outs:
                np.asarray(o["tokens"])
            return time.perf_counter() - start

        best, median = window_stats(tok_block)
        _emit(
            f"tokenize_{tag}_residues_per_sec_per_chip", "residues/s/chip",
            valid * TIMED_ITERS / best / n_chips, None,
            median=valid * TIMED_ITERS / median / n_chips,
        )

        if df > 1 and _remaining() > 150:
            rng = np.random.RandomState(0)
            t_len = cfg.data.seq_max_size // df
            # 32 rows: this runner is f32 (conformance dtype) — the f32 pair
            # tensor caps B at 32 within 16 GB; DECODE_SUB=64 applies to the
            # bf16 headline path only (a 64-row f32 dispatch OOMs HBM and
            # crashes the remote-compile helper with HTTP 500).
            seqs = [
                rng.randint(0, cfg.fsq.num_codes, size=(lengths[q] // df,))
                for q in rows[: min(32, DECODE_SUB)]
            ]
            n_res = sum(len(s) * df for s in seqs)
            ids = runner.pad_token_rows(seqs, effective_len=t_len)
            _, out = runner.dispatch_decode(ids)
            np.asarray(out["backbone_positions"])  # warm

            def dec_block():
                start = time.perf_counter()
                outs = [
                    runner.dispatch_decode(ids)[1] for _ in range(TIMED_ITERS)
                ]
                for o in outs:
                    np.asarray(o["backbone_positions"])
                return time.perf_counter() - start

            best, median = window_stats(dec_block)
            _emit(
                f"decode_{tag}_residues_per_sec_per_chip", "residues/s/chip",
                n_res * TIMED_ITERS / best / n_chips, None,
                median=n_res * TIMED_ITERS / median / n_chips,
            )
        _note(f"variants: {tag} done")

    if _remaining() < 120:
        _note(f"variants: fsq64k SKIPPED ({_remaining():.0f}s left)")
        return
    # FSQ distance diagnostics at K=64000: the Pallas implicit-grid kernel
    # (ops/fsq_kernels.py) vs the reference's ~100 GB (B, N, K, D)
    # intermediate (which cannot run at this batch at all).  Host fetch is a
    # scalar reduction so device->tunnel traffic never bounds the number.
    cfg64 = preset(64000, 1)
    b, n = 8, cfg64.data.seq_max_size
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.randn(b, n, len(cfg64.fsq.levels)).astype(np.float32))
    masks = jnp.ones((b, n, len(cfg64.fsq.levels)), jnp.float32)

    @jax.jit
    def diag(x, m):
        out = fsq_lib.quantize(
            cfg64.fsq, x, m, compute_usage=True, compute_distances=True
        )
        return out["tokens"], out["soft_proba"].sum(), out["distances"].sum()

    np.asarray(diag(inputs, masks)[2])  # warm

    def fsq_block():
        start = time.perf_counter()
        outs = [diag(inputs, masks) for _ in range(TIMED_ITERS)]
        for o in outs:
            np.asarray(o[2])
        return time.perf_counter() - start

    best, median = window_stats(fsq_block)
    _emit(
        "fsq64k_diagnostics_residues_per_sec_per_chip", "residues/s/chip",
        b * n * TIMED_ITERS / best / n_chips, None,
        median=b * n * TIMED_ITERS / median / n_chips,
    )
    _note("variants: fsq64k diagnostics done")


HEADLINE_METRIC = "casp14_tokenize_residues_per_sec_per_chip"
_EMITTED: "dict[str, str]" = {}  # metric -> latest JSON line, insertion-ordered


def _emit(metric, unit, ours, ref, median=None):
    # vs_baseline is null when the reference was never measured — an
    # unmeasured ratio must be distinguishable from true parity.  ``median``
    # (when given) rides along so round-over-round deltas are separable from
    # the backend's ~2x best-window weather.
    record = {
        "metric": metric,
        "value": round(ours, 2),
        "unit": unit,
        "vs_baseline": round(ours / ref, 3) if ref else None,
    }
    if median is not None:
        record["median"] = round(median, 2)
    line = json.dumps(record)
    _EMITTED[metric] = line
    print(line, flush=True)


def _reemit_all():
    """Insurance block: re-print EVERY metric completed so far, so the
    driver-recorded tail is self-sufficient no matter where the budget
    expires.  The tokenize headline goes LAST (the driver parses the final
    line as the round's headline)."""
    for metric, line in _EMITTED.items():
        if metric != HEADLINE_METRIC:
            print(line, flush=True)
    if HEADLINE_METRIC in _EMITTED:
        print(_EMITTED[HEADLINE_METRIC], flush=True)


BASELINE_KEYS = (
    "reference_residues_per_sec_per_chip",
    "reference_decode_residues_per_sec_per_chip",
    "reference_generate_tokens_per_sec_per_chip",
)
REF_TIMEOUT_S = int(os.environ.get("PST_BENCH_REF_TIMEOUT_S", "900"))


def _corpus_lengths():
    from protein_structure_tokenizer_tpu.data.sample import parse_pdb_file

    lengths = {}
    for path in sorted(glob.glob(os.path.join(CASP14_DIR, "*.pdb"))):
        try:
            lengths[path] = parse_pdb_file(path).nb_residues
        except Exception:
            continue
    return lengths


def measure_reference_baselines():
    """Measure any missing reference baselines, saving each as it lands (so a
    timeout kill part-way still leaves the finished ones cached)."""
    baselines = load_baselines()
    if baselines.get(BASELINE_KEYS[2]) is None:
        try:
            print(f"# generate ref: {_measure_generate_reference():.1f}", file=sys.stderr)
        except Exception as e:
            print(f"# generate baseline failed: {type(e).__name__}: {e}", file=sys.stderr)
    if baselines.get(BASELINE_KEYS[1]) is None:
        lens = sorted(_corpus_lengths().values())
        rows = sorted(lens[i % len(lens)] for i in range(DECODE_SUB * DECODE_BATCHES))
        ref = _bench_decode_reference(rows, params_seed=0)
        if ref:
            save_baseline(BASELINE_KEYS[1], ref)
            print(f"# decode ref: {ref:.1f}", file=sys.stderr)
    if baselines.get(BASELINE_KEYS[0]) is None:
        batch, valid_residues = featurize_corpus()
        ref = bench_reference(batch, valid_residues)
        if ref:
            print(f"# tokenize ref: {ref:.1f}", file=sys.stderr)


def ensure_reference_baselines():
    """Populate missing baseline-cache entries from a subprocess that is
    killed (whole process group) after REF_TIMEOUT_S.  Must run BEFORE this
    process initializes the TPU — two processes cannot share the chip.
    With the committed bench_baseline.json holding all three keys this is a
    no-op on a driver run."""
    import signal
    import subprocess

    if all(load_baselines().get(k) is not None for k in BASELINE_KEYS):
        return
    # Never let baseline measurement eat the whole budget: cap at the
    # smaller of REF_TIMEOUT_S and half the remaining wall clock.
    timeout = min(REF_TIMEOUT_S, max(60.0, _remaining() / 2))
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--measure-reference"],
        start_new_session=True,
    )
    try:
        proc.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"# reference baseline measurement timed out after {timeout:.0f}s; "
              "continuing with partial cache", file=sys.stderr)
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()


def main():
    # Build the native featurizer if absent (~2 s): the untimed host
    # featurize of the 256-graph corpus routes through the C++ k-NN module
    # when built — meaningful wall-clock inside a driver window.
    lib = os.path.join(
        REPO_ROOT, "protein_structure_tokenizer_tpu", "native", "libpst_native.so"
    )
    if not os.path.exists(lib):
        import subprocess

        try:
            subprocess.run(
                ["make", "native"], cwd=REPO_ROOT, timeout=120,
                capture_output=True, check=False,
            )
        except Exception:
            pass  # python fallback featurizer works regardless

    ensure_reference_baselines()
    _note("baselines ready")

    # ---- headline tokenize FIRST: an insurance line exists as early as
    # possible even if the driver's budget expires later in the run.
    tok = bench_ours()
    ours, n_chips = tok["value"], tok["n_chips"]
    ref = load_baselines().get(BASELINE_KEYS[0])
    _emit(
        "casp14_tokenize_residues_per_sec_per_chip", "residues/s/chip",
        ours, ref, median=tok["median"],
    )
    _emit_roofline("casp14_tokenize", tok["flops"], tok["bytes"], tok["elapsed"], n_chips)
    _note(f"tokenize done: {ours:.0f} res/s/chip")

    def _emit_headline():
        # The driver records the FINAL lines; after every stage re-emit ALL
        # completed metrics (tokenize last) so a kill at ANY point leaves a
        # self-sufficient tail containing every number this round claims.
        _reemit_all()

    if _remaining() > STAGE_MIN_S["decode"]:
        try:
            dec = bench_decode(_corpus_lengths())
            _emit(
                "casp14_decode_residues_per_sec_per_chip", "residues/s/chip",
                dec["value"], dec["ref"], median=dec["median"],
            )
            _emit_roofline(
                "casp14_decode", dec["flops"], dec["bytes"], dec["elapsed"],
                dec["n_chips"],
            )
            _note(f"decode done: {dec['value']:.0f} res/s/chip")
        except Exception as e:  # a failed stage must never kill the headline
            _note(f"decode FAILED: {type(e).__name__}: {e}")
    else:
        _note(f"decode SKIPPED: {_remaining():.0f}s remaining < {STAGE_MIN_S['decode']:.0f}s")
    _emit_headline()

    gen_min = STAGE_MIN_S["generate"] if _generate_cache_warm() else GENERATE_COLD_S
    if _remaining() > gen_min:
        try:
            gen = bench_generate()
            _mark_generate_warm()
            _emit(
                "gpt_generate_tokens_per_sec_per_chip", "tokens/s/chip",
                gen["value"], gen["ref"], median=gen["median"],
            )
            _emit_roofline("gpt_generate", gen["flops"], gen["bytes"], gen["elapsed"])
            _note(f"generate done: {gen['value']:.0f} tok/s/chip")
            if _remaining() > STAGE_MIN_S["generate"]:
                tp, tp_med, _ = gen["measure"](GENERATE_THROUGHPUT_BATCH)
                _emit(
                    "gpt_generate_throughput_mode_tokens_per_sec_per_chip",
                    f"tokens/s/chip@B={GENERATE_THROUGHPUT_BATCH}",
                    tp, None, median=tp_med,
                )
                _note(f"generate throughput mode done: {tp:.0f} tok/s/chip")
            if _remaining() > STAGE_MIN_S["generate"]:
                # Full int8 serving recipe (--int8 --int8_kv): int8 matmul
                # weights (lm.quant) + int8 KV cache with per-vector scales
                # folded into the attention matmuls — halves BOTH dominant
                # HBM terms of a cached step vs bf16.
                import jax

                from protein_structure_tokenizer_tpu.lm import quant

                qparams = jax.device_put(
                    quant.quantize_gpt_params_int8(gen["params"])
                )
                i8, i8_med, i8_s = gen["measure"](16, qparams, int8_kv=True)
                _emit(
                    "gpt_generate_int8_tokens_per_sec_per_chip",
                    "tokens/s/chip", i8, gen["ref"], median=i8_med,
                )
                # Analytic roofline for the int8 recipe: same matmul FLOPs
                # (identical math), bytes from the int8 param tree + int8 KV
                # cache at the int8 segment choice.
                from protein_structure_tokenizer_tpu.lm import gpt as gpt_mod
                from protein_structure_tokenizer_tpu.utils import roofline

                i8_cfg = gpt_mod.released_gpt_config(4096)
                i8_bytes = roofline.generate_block_bytes(
                    qparams, i8_cfg, 16, i8_cfg.max_position_embeddings,
                    segment=128, int8_kv=True,
                ) * TIMED_ITERS
                _emit_roofline(
                    "gpt_generate_int8", gen["flops"], i8_bytes, i8_s
                )
                _note(f"generate int8 done: {i8:.0f} tok/s/chip")
                if _remaining() > STAGE_MIN_S["generate"]:
                    i8t, i8t_med, _ = gen["measure"](
                        GENERATE_THROUGHPUT_BATCH, qparams, int8_kv=True
                    )
                    _emit(
                        "gpt_generate_int8_throughput_mode_tokens_per_sec_per_chip",
                        f"tokens/s/chip@B={GENERATE_THROUGHPUT_BATCH}",
                        i8t, None, median=i8t_med,
                    )
                    _note(f"generate int8 throughput mode done: {i8t:.0f} tok/s/chip")
        except Exception as e:
            # Known failure mode on this backend: the remote-compile service
            # drops the connection ("Broken pipe") after ~30 min on the
            # 514-step KV-cache scan program.  The headline still emits.
            _note(f"generate FAILED: {type(e).__name__}: {e}")
    else:
        _note(f"generate SKIPPED: {_remaining():.0f}s remaining < {gen_min:.0f}s")
    _emit_headline()

    if _remaining() > STAGE_MIN_S["variants"]:
        try:
            bench_variants()
        except Exception as e:
            _note(f"variants FAILED: {type(e).__name__}: {e}")
    else:
        _note(f"variants SKIPPED: {_remaining():.0f}s remaining < {STAGE_MIN_S['variants']:.0f}s")
    _emit_headline()


if __name__ == "__main__":
    if "--measure-reference" in sys.argv:
        measure_reference_baselines()
    else:
        main()
