"""Inference runner: batched tokenize / decode / autoencode over a device mesh.

Feature parity with /root/reference/scripts/inference_runner.py:168-437,
TPU-native design:

  * ``jax.jit`` + ``NamedSharding`` over a 1-D ``data`` mesh instead of pmap:
    batches shard over every chip (across hosts), parameters stay replicated,
    reductions ride ICI.  The same code path runs on 1 chip or a pod slice.
  * Host featurization runs in a process pool overlapping device compute
    (the reference featurizes serially between pmap dispatches).
  * The tokenize path computes token ids only — the O(B*N*K) distance
    diagnostics the reference computes and throws away are off by default.
"""
from __future__ import annotations

import dataclasses
import functools
import logging
import os
import time
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from itertools import cycle, islice
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from protein_structure_tokenizer_tpu.data import featurize as featurize_lib
from protein_structure_tokenizer_tpu.data.protein_io import Protein, to_pdb
from protein_structure_tokenizer_tpu.data.sample import parse_structure_file
from protein_structure_tokenizer_tpu.data.types import ProteinGraphBatch
from protein_structure_tokenizer_tpu.models import vq3d
from protein_structure_tokenizer_tpu.models.config import Vq3dConfig
from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
from protein_structure_tokenizer_tpu.utils.params import Params
from protein_structure_tokenizer_tpu.utils.profiling import StageTimers, device_trace

logger = logging.getLogger(__name__)


def build_tokens_mask_from_sequence(tokens_ids: np.ndarray, pad_token_id: int) -> np.ndarray:
    """1 for positions before the first pad/eos token (per row)."""
    assert tokens_ids.ndim >= 2
    is_eos = tokens_ids == pad_token_id
    return np.where(np.cumsum(is_eos, axis=-1) == 0, 1, 0)


def build_nodes_mask_from_tokens_mask(tokens_mask: np.ndarray, downsampling_ratio: int) -> np.ndarray:
    batch, seq_len = tokens_mask.shape
    n_tokens = tokens_mask.sum(axis=-1)
    last_true = (downsampling_ratio * n_tokens).reshape(batch, 1)
    index = np.broadcast_to(np.arange(downsampling_ratio * seq_len), (batch, downsampling_ratio * seq_len))
    return np.where(index < last_true, 1, 0)


def _featurize_one(args):
    path, num_neighbor, downsampling, residue_loc_is_alphac, padding = args
    graph = featurize_lib.make_graph_from_pdb(
        path,
        num_neighbor=num_neighbor,
        downsampling_ratio=downsampling,
        residue_loc_is_alphac=residue_loc_is_alphac,
        padding_num_residue=padding,
    )
    return dataclasses.asdict(graph)


def _featurize_one_safe(args):
    """Worker variant that reports failures instead of raising (skip_invalid)."""
    try:
        return _featurize_one(args)
    except Exception as exc:  # noqa: BLE001 — per-sample isolation by design
        return {"__error__": f"{type(exc).__name__}: {exc}"}


def collate_graphs(graph_dicts: Sequence[dict]) -> ProteinGraphBatch:
    """Stack single-sample graphs into a (B, ...) batch."""
    stacked = {
        key: np.stack([np.asarray(g[key]) for g in graph_dicts])
        for key in graph_dicts[0]
        if key != "canonical_receivers"
    }
    return ProteinGraphBatch(
        n_node=stacked["n_node"],
        n_edge=stacked["n_edge"],
        nodes_mask=stacked["nodes_mask"].astype(np.float32),
        tokens_mask=stacked["tokens_mask"].astype(np.float32),
        nodes_original_coordinates=stacked["nodes_original_coordinates"].astype(np.float32),
        node_features=stacked["node_features"].astype(np.float32),
        edge_features=stacked["edge_features"].astype(np.float32),
        senders=stacked["senders"],
        receivers=stacked["receivers"],
    )


def pad_tokens_axis(batch: ProteinGraphBatch, t_full: int) -> ProteinGraphBatch:
    """Zero-pad tokens_mask to the model's full query length.

    The downsampler always emits ``max_out_len`` queries (their sinusoidal
    PE base is bound to it), so bucketed graphs — whose featurizer-built
    tokens_mask is only ``bucket/df`` long — pad it with zero (masked) rows."""
    tm = np.asarray(batch.tokens_mask)
    if tm.shape[1] >= t_full:
        return batch
    tm = np.pad(tm, ((0, 0), (0, t_full - tm.shape[1]), (0, 0)))
    return dataclasses.replace(batch, tokens_mask=tm)


def default_length_buckets(config) -> Optional[tuple]:
    """Quarter-point padding buckets up to seq_max, rounded up to a
    df-and-8-divisible boundary (8 keeps the node axis sublane-friendly)."""
    seq = config.data.seq_max_size
    df = config.data.downsampling_ratio
    mult = df * 8 if seq % (df * 8) == 0 else df
    buckets = sorted(
        {min(seq, -(-max(seq // 4 * i, mult) // mult) * mult) for i in (1, 2, 3, 4)}
    )
    return tuple(buckets) if len(buckets) > 1 else None


_RUN_SENTINEL = ".pst_run"
# Adjudication waits (module-level for tests): process 0 decides in
# _P0_WAIT_S; peers out-wait that verdict before refusing.
_P0_WAIT_S = 2.0
_PEER_WAIT_S = 10.0


_run_id_cache: list = []


def _run_identity() -> str:
    """A value every process of THIS run shares but no other run does:
    process 0 draws random bytes and broadcasts them (single-process runs
    skip the collective).  Lets sentinel adjudication distinguish "racing
    peer of my run" from "live sentinel left by a DIFFERENT overlapping run
    pointed at the same directory".  Memoized per process: every output dir
    a run creates carries the same id, and a same-process rerun after a
    crash re-presents the crashed run's id (so it may reclaim the dir, as
    before run ids existed)."""
    if not _run_id_cache:
        if jax.process_count() == 1:
            _run_id_cache.append(os.urandom(8).hex())
        else:
            from jax.experimental import multihost_utils

            seed = np.frombuffer(os.urandom(8), dtype=np.int64)
            shared = multihost_utils.broadcast_one_to_all(seed)
            _run_id_cache.append(np.asarray(shared).tobytes().hex())
    return _run_id_cache[0]


def _make_output_dir(path: str) -> None:
    """Reference semantics — refuse a PRE-EXISTING output dir
    (inference_runner.py:265) — made multi-host safe.

    Only the process whose ``makedirs`` WINS may write into the dir (it drops
    a sentinel carrying the run id immediately).  Every other process —
    process 0 included — waits for that sentinel before touching anything: a
    sentinel carrying THIS run's id proves a racing peer of this run created
    the dir; a foreign id means another live run owns the dir (refuse — do
    not interleave two runs' outputs); a timeout means the dir pre-existed
    (stale user data) and EVERY process refuses it, so no peer ever pollutes
    a directory that is about to be adjudicated stale.  Peers wait longer
    than process 0 so a refusal is never racy against process 0's own
    verdict."""
    run_id = _run_identity()  # collective: before the makedirs race
    sentinel = os.path.join(path, _RUN_SENTINEL)
    try:
        os.makedirs(path)
    except FileExistsError:
        wait_s = _P0_WAIT_S if jax.process_index() == 0 else _PEER_WAIT_S
        deadline = time.perf_counter() + wait_s
        while not os.path.exists(sentinel):
            if time.perf_counter() > deadline:
                raise FileExistsError(
                    f"output dir already exists: {path}"
                ) from None
            time.sleep(0.05)
        try:
            with open(sentinel) as f:
                owner = f.read().strip()
        except OSError:
            owner = ""
        if owner != run_id:
            raise FileExistsError(
                f"output dir {path} is owned by a different live run "
                f"(sentinel id {owner[:8]!r}); refusing to interleave outputs"
            ) from None
        return  # a racing peer of this run owns the dir
    with open(sentinel, "w") as f:
        f.write(run_id)


def _finish_output_dir(path: Optional[str]) -> None:
    """Remove the run sentinel: a COMPLETED run's dir must be refused by the
    next run (reference overwrite protection); only a crashed run leaves the
    sentinel behind (and may be overwritten by a rerun)."""
    if path is None:
        return
    try:
        os.remove(os.path.join(path, _RUN_SENTINEL))
    except OSError:
        pass


# Dummy-ALA backbone atom37 occupancy: N, CA, C present, CB absent, O present
# (vq3d._dummy_ala_features); constant across residues.
ALA_BACKBONE_ATOM37_MASK = np.array([1, 1, 1, 0, 1] + [0] * 32, np.int32)


def expand_backbone_atoms(backbone5: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Packed decode output (…, 5, 3) -> bitwise-identical full atom37 arrays.

    Returns ``(positions (…, 37, 3), mask (…, 37))`` equal to what
    ``decode_and_make_structure`` produces on device: slots 5..36 are
    identically zero there (masked by ``atom37_gt_exists``), so only the first
    five atom slots cross the wire.
    """
    positions = np.zeros(backbone5.shape[:-2] + (37, 3), backbone5.dtype)
    positions[..., :5, :] = backbone5
    mask = np.ascontiguousarray(
        np.broadcast_to(ALA_BACKBONE_ATOM37_MASK, backbone5.shape[:-2] + (37,))
    )
    return positions, mask


def dummy_ala_protein(positions: np.ndarray, mask: np.ndarray) -> Protein:
    """Backbone-only decoded structure as a dummy-ALA Protein, like the
    reference decode path (inference_runner.py:412-427)."""
    n = positions.shape[0]
    aatype_dummy = np.concatenate([np.ones((n, 1)), np.zeros((n, 20))], axis=-1)
    return Protein.from_atom37_rep(
        atom37_positions=positions,
        atom37_gt_exists=mask,
        atom37_atom_exists=mask,
        aatype=aatype_dummy,
        chain_id="A",
    )


def _with_compiler_options(jit_fn, options: dict):
    """Call-compatible wrapper that compiles ``jit_fn`` per argument-shape
    signature with XLA ``compiler_options`` (jit itself cannot carry them).
    Falls back to the plain jit path if the backend rejects an option, so a
    tuning knob for one backend never breaks another."""
    cache: dict = {}

    def call(*args):
        key = tuple(
            (tuple(leaf.shape), str(leaf.dtype))
            for leaf in jax.tree_util.tree_leaves(args)
            if hasattr(leaf, "shape")
        )
        if key not in cache:
            try:
                cache[key] = jit_fn.lower(*args).compile(
                    compiler_options=options
                )
            except Exception:
                cache[key] = jit_fn
        return cache[key](*args)

    call.lower = jit_fn.lower
    return call


# Stops XLA's memory-space assignment from round-tripping large loop-carried
# buffers through VMEM as copies (measured: +31% decode, +29% generate on
# v5e — docs/PERFORMANCE.md).  Applied to the decode executable; harmless
# elsewhere but only measured as a win there and in lm/sampling.
DECODE_COMPILER_OPTIONS = {
    "xla_tpu_async_copy_bandwidth_scaling_factor": "0.1",
}


class InferenceRunner:
    """Sharded tokenizer inference over a data-parallel mesh."""

    def __init__(
        self,
        config: Vq3dConfig,
        params: Params,
        mesh=None,
        *,
        exact_aggregation: bool = False,
        num_featurize_workers: int = 0,
        compute_dtype=None,
        context_parallel: int = 1,
        length_buckets="auto",
        compiler_options="auto",
        pipeline_depth: int = 3,
    ):
        """``compute_dtype=jnp.bfloat16`` runs the forward matmuls in bf16
        (2x MXU, half HBM traffic) with f32 islands for FSQ rounding, IPA
        point geometry, softmax, and rigid-body composition; params and
        outputs stay f32.  Default (None) is full f32 — the conformance path.
        Incompatible with ``exact_aggregation``.

        ``context_parallel > 1`` decodes on a ("data", "ctx") mesh with the
        quadratic pair track row-sharded over "ctx" (parallel/cp.py): per-chip
        pair memory and pair FLOPs scale 1/ctx.

        ``length_buckets`` — tokenize pads each batch to the smallest bucket
        that fits its longest chain instead of always seq_max (the reference
        pads everything to 512, inference_runner.py:191-216; CASP14 averages
        181 residues, so ~65% of its edge-table FLOPs/bytes are padding).
        Positional-encoding bases stay bound to seq_max, so token ids are
        bit-identical to full padding (tests/test_buckets.py).  "auto"
        derives quarter-point buckets from seq_max; pass a sequence for
        custom buckets or None/() to disable.  One XLA compilation per
        bucket.  Disabled under ``exact_aggregation`` (bitwise-activation
        conformance keeps the reference's shapes).

        ``compiler_options`` — XLA options for the DECODE executable.
        "auto" (default) applies :data:`DECODE_COMPILER_OPTIONS` on TPU
        (+31% decode on v5e: stops memory-space assignment from copying the
        fold loop's carried buffers through VMEM); pass ``None`` to disable
        or a dict to override.  Numerics are unaffected (scheduling-only
        option).

        ``pipeline_depth`` — dispatches kept in flight by tokenize/decode
        before blocking on the oldest result (plus the host prefetch
        thread).  Depth d overlaps the per-dispatch host+tunnel latency of
        d-1 later batches with the device compute of the current one; 3 is
        enough to hide a ~30 ms dispatch under ~100+ ms device programs
        without ballooning device-resident output buffers."""
        if compute_dtype is not None and exact_aggregation:
            raise ValueError("exact_aggregation requires full f32 compute")
        if pipeline_depth < 1:
            raise ValueError("pipeline_depth must be >= 1")
        self.pipeline_depth = int(pipeline_depth)
        self.config = config
        if length_buckets == "auto":
            self.length_buckets = (
                None if exact_aggregation else default_length_buckets(config)
            )
        elif length_buckets:
            df = config.data.downsampling_ratio
            bad = [b for b in length_buckets if b % df or b > config.data.seq_max_size]
            if bad:
                raise ValueError(
                    f"length_buckets must be df={df}-divisible and <= seq_max="
                    f"{config.data.seq_max_size}; got {bad}"
                )
            self.length_buckets = tuple(sorted(set(length_buckets)))
        else:
            self.length_buckets = None
        if mesh is not None:
            self.mesh = mesh
        elif context_parallel > 1:
            from protein_structure_tokenizer_tpu.parallel import cp

            self.mesh = cp.make_ctx_mesh(context_parallel)
        else:
            self.mesh = mesh_lib.make_mesh()
        self.params = mesh_lib.replicate(self.mesh, params)
        self.exact_aggregation = exact_aggregation
        self.num_featurize_workers = num_featurize_workers
        self._pool: Optional[ProcessPoolExecutor] = None

        batch_sharding = mesh_lib.batch_sharding(self.mesh)
        replicated = mesh_lib.replicated_sharding(self.mesh)

        cfg = config

        model_mesh = self.mesh  # cp constraints no-op without a "ctx" axis
        # On a pure data mesh with >1 device, run tokenize/decode as
        # shard_map over "data": each device executes the SINGLE-DEVICE
        # model on its batch shard (rows are independent; tokenize/decode
        # have no cross-row math), so the single-device-only Pallas fast
        # paths stay active on real multi-chip data parallelism instead of
        # falling back to the jnp schedules.  Meshes with a "ctx" axis keep
        # the GSPMD path (the pair track genuinely shards across devices).
        data_only_spmd = (
            tuple(self.mesh.axis_names) == (mesh_lib.DATA_AXIS,)
            and self.mesh.size > 1
        )
        inner_mesh = None if data_only_spmd else model_mesh

        def _tokenize_impl(params, graph):
            out = vq3d.encode_and_quantize(
                params,
                cfg,
                graph,
                compute_usage=False,
                exact_aggregation=exact_aggregation,
                mesh=inner_mesh,
            )
            return {"tokens": out["tokens"]}

        def _decode_impl(params, quantized, nodes_mask, tokens_mask):
            out = vq3d.decode_and_make_structure(
                params, cfg, quantized, nodes_mask, tokens_mask,
                exact_ipa=exact_aggregation, mesh=inner_mesh,
            )
            # The decoder is backbone-only (dummy-ALA: atom37 slots 0-4, with
            # CB=3 masked to zero), so ship the packed (B, N, 5, 3) instead of
            # the 86%-zeros (B, N, 37, 3) — 7.4x less device->host traffic.
            # ``expand_backbone_atoms`` rebuilds the bitwise-identical atom37
            # arrays host-side.
            return {"backbone_positions": out["final_atom_positions"][..., :5, :]}

        if compute_dtype is not None:
            from protein_structure_tokenizer_tpu.runtime.precision import (
                mixed_precision_policy,
            )

            _tokenize_impl = mixed_precision_policy(_tokenize_impl, compute_dtype)
            _decode_impl = mixed_precision_policy(_decode_impl, compute_dtype)

        def _decode_tokens_impl(params, tokens_ids):
            """Fused decode-from-token-ids: mask building + FSQ codec +
            decode in ONE device program.  The unfused path costs three
            host->device transfers and two program dispatches per batch
            (codes via a separate indexes_to_codes jit, then two f32 masks);
            through a tunneled chip each RPC is ~10-40 ms of serial host
            time, which is exactly the end-to-end-vs-per-op roofline gap
            the decode bench measures.  Mask math mirrors
            build_tokens_mask_from_sequence / build_nodes_mask_from_tokens_mask
            bit-for-bit."""
            df = cfg.data.downsampling_ratio
            is_pad = tokens_ids == cfg.data.pad_token_id
            tokens_mask = (jnp.cumsum(is_pad, axis=-1) == 0).astype(jnp.float32)
            n_tokens = tokens_mask.sum(axis=-1)
            n = tokens_ids.shape[-1] * df
            idx = jnp.arange(n)
            nodes_mask = (
                idx[None, :] < (df * n_tokens)[:, None]
            ).astype(jnp.float32)
            quantized = vq3d.indexes_to_codes(cfg, tokens_ids)
            return _decode_impl(
                params, quantized, nodes_mask[..., None], tokens_mask[..., None]
            )

        if data_only_spmd:
            _tokenize = mesh_lib.data_shard_map(_tokenize_impl, self.mesh, 1)
            _decode = mesh_lib.data_shard_map(_decode_impl, self.mesh, 3)
            _decode_tokens = mesh_lib.data_shard_map(
                _decode_tokens_impl, self.mesh, 1
            )
        else:
            _tokenize = functools.partial(
                jax.jit,
                in_shardings=(replicated, batch_sharding),
                out_shardings=batch_sharding,
            )(_tokenize_impl)

            _decode = functools.partial(
                jax.jit,
                in_shardings=(replicated, batch_sharding, batch_sharding, batch_sharding),
                out_shardings=batch_sharding,
            )(_decode_impl)

            _decode_tokens = functools.partial(
                jax.jit,
                in_shardings=(replicated, batch_sharding),
                out_shardings=batch_sharding,
            )(_decode_tokens_impl)

        @jax.jit
        def _indexes_to_codes(tokens):
            return vq3d.indexes_to_codes(cfg, tokens)

        def _autoencode_impl(params, batch):
            decoded, quant = vq3d.forward(
                params, cfg, batch,
                is_training=False,
                compute_usage=False,
                exact_aggregation=exact_aggregation,
                exact_ipa=exact_aggregation,
                mesh=inner_mesh,
            )
            return {
                "tokens": quant["tokens"],
                "final_atom_positions": decoded["final_atom_positions"],
                "final_atom_mask": decoded["final_atom_mask"],
            }

        if compute_dtype is not None:
            from protein_structure_tokenizer_tpu.runtime.precision import (
                mixed_precision_policy,
            )

            _autoencode_impl = mixed_precision_policy(_autoencode_impl, compute_dtype)

        if data_only_spmd:
            _autoencode = mesh_lib.data_shard_map(_autoencode_impl, self.mesh, 1)
        else:
            _autoencode = functools.partial(
                jax.jit,
                in_shardings=(replicated, batch_sharding),
                out_shardings=batch_sharding,
            )(_autoencode_impl)

        if compiler_options == "auto":
            compiler_options = (
                DECODE_COMPILER_OPTIONS
                if jax.default_backend() == "tpu"
                else None
            )
        if compiler_options:
            _decode = _with_compiler_options(_decode, compiler_options)
            _decode_tokens = _with_compiler_options(_decode_tokens, compiler_options)

        self.tokenize_fn = _tokenize
        self.decode_fn = _decode
        self.decode_tokens_fn = _decode_tokens
        self.indexes_to_codes_fn = _indexes_to_codes
        self.autoencode_fn = _autoencode

    # -- featurization ------------------------------------------------------
    def featurize(
        self, pdb_paths: Sequence[str], *, skip_invalid: bool = False,
        padding: Optional[int] = None,
    ) -> List[dict]:
        """Featurize paths; with ``skip_invalid`` a failing sample yields a
        ``{"__error__": ...}`` marker instead of raising (the reference
        fail-fasts its whole batch; production batch jobs want isolation).
        ``padding`` overrides the node padding (length buckets)."""
        cfg = self.config.data
        args = [
            (
                p,
                cfg.graph_max_neighbor,
                cfg.downsampling_ratio,
                cfg.graph_residue_loc_is_alphac,
                padding or cfg.seq_max_size,
            )
            for p in pdb_paths
        ]
        worker = _featurize_one_safe if skip_invalid else _featurize_one
        if self.num_featurize_workers > 0:
            if self._pool is None:
                self._pool = ProcessPoolExecutor(self.num_featurize_workers)
            return list(self._pool.map(worker, args))
        return [worker(a) for a in args]

    # -- tokenize -----------------------------------------------------------
    def tokenize(
        self,
        pdb_paths: Sequence[str],
        token_save_path: Optional[str] = None,
        *,
        batch_size_per_device: int = 16,
        progress: bool = False,
        profile_dir: Optional[str] = None,
        skip_invalid: bool = False,
    ) -> dict:
        """Tokenize PDBs; returns {basename: np.ndarray tokens}, optionally
        saving ``<name>_tokens.npy`` files like the reference runner.

        ``profile_dir`` captures an XLA profiler trace of the whole loop with
        per-stage host annotations (featurize/collate/device/save).
        ``skip_invalid`` logs and skips structures that fail featurization
        (too few/many residues, malformed PDB) instead of failing the batch —
        their rows are backfilled with a valid structure so the padded batch
        shape is preserved, and no tokens are emitted for them.

        The host input pipeline is one batch ahead of the device: while the
        device crunches batch ``i``, a prefetch thread featurizes, collates
        and device_puts batch ``i+1`` (host featurization and device forward
        are the two comparable-cost stages of the loop — overlapping them
        approaches ``max`` instead of ``sum``).  The reference runs every
        stage sequentially (inference_runner.py:286-306).
        """
        if token_save_path is not None:
            _make_output_dir(token_save_path)
        timers = StageTimers()

        global_batch = mesh_lib.global_batch_size(self.mesh, batch_size_per_device)

        lengths: dict = {}
        if self.length_buckets:
            # Cheap pre-scan (parse only, no featurization): chain lengths
            # drive bucket choice and an ascending sort that keeps batches
            # length-homogeneous.  Every host scans the full list so all
            # processes agree on batch composition and bucket sizes.
            with timers.annotated_stage("length_scan"):
                for p in pdb_paths:
                    try:
                        lengths[p] = parse_structure_file(p).nb_residues
                    except Exception:  # noqa: BLE001 — featurize re-raises properly
                        lengths[p] = self.config.data.seq_max_size
            pdb_paths = sorted(pdb_paths, key=lambda p: (lengths[p], p))

        num_iterations = -(-len(pdb_paths) // global_batch)
        padded_paths = list(islice(cycle(pdb_paths), num_iterations * global_batch))

        def chunk_padding(chunk) -> Optional[int]:
            if not self.length_buckets:
                return None
            longest = max(lengths[p] for p in chunk)
            return next(
                (b for b in self.length_buckets if b >= longest),
                self.config.data.seq_max_size,
            )

        results = {}
        iterator = range(num_iterations)
        if progress:
            try:
                from tqdm import tqdm

                iterator = tqdm(iterator, total=num_iterations)
            except ImportError:
                pass

        local = mesh_lib.process_local_slice(self.mesh, global_batch)

        def prepare(it: int):
            """Host-side work for one batch: featurize -> collate -> shard."""
            chunk = padded_paths[it * global_batch : (it + 1) * global_batch]
            with timers.annotated_stage("featurize"):
                # Each host featurizes only the rows it feeds to its own
                # devices; single-process runs featurize everything.
                graphs = self.featurize(
                    chunk[local], skip_invalid=skip_invalid,
                    padding=chunk_padding(chunk),
                )
            failed_rows = set()
            if skip_invalid:
                donor = next((g for g in graphs if "__error__" not in g), None)
                for row, g in enumerate(graphs):
                    if "__error__" in g:
                        logger.warning(
                            "skipping %s: %s", chunk[local][row], g["__error__"]
                        )
                        failed_rows.add(row)
                        graphs[row] = donor
                if donor is None:
                    return chunk, failed_rows, None, None
            with timers.annotated_stage("collate+shard"):
                local_batch = collate_graphs(graphs)
                local_batch = pad_tokens_axis(
                    local_batch, self.config.down_sampler.max_out_len
                )
                batch = mesh_lib.shard_batch_from_local(
                    self.mesh, local_batch, global_batch
                )
            return chunk, failed_rows, local_batch, batch

        def fetch_and_save(entry):
            """Block on one in-flight batch's device results and persist them."""
            chunk, failed_rows, local_batch, out = entry
            with timers.annotated_stage("device"):
                tokens = mesh_lib.local_rows(out["tokens"])
            n_tokens = np.asarray(local_batch.tokens_mask).reshape(
                tokens.shape[0], -1
            ).sum(axis=1)
            with timers.annotated_stage("save"):
                # Each host writes only its own rows (process-sharded IO).
                for row, path in enumerate(chunk[local]):
                    if row in failed_rows:
                        continue
                    name = os.path.splitext(os.path.basename(path))[0]
                    token_array = tokens[row : row + 1, : int(n_tokens[row])]
                    results[name] = token_array
                    if token_save_path is not None:
                        np.save(
                            os.path.join(token_save_path, name + "_tokens"),
                            token_array,
                        )

        # Two-deep dispatch pipeline on top of the host prefetch thread: jax
        # dispatch is async, so batch i+1 is enqueued on the device BEFORE
        # blocking on batch i's results — the per-dispatch latency (large
        # through a tunneled chip, nonzero everywhere) overlaps device
        # compute instead of serializing after it.
        from collections import deque

        prefetcher = ThreadPoolExecutor(1)
        in_flight: deque = deque()
        try:
            with device_trace(profile_dir):
                pending = prefetcher.submit(prepare, 0)
                for it in iterator:
                    chunk, failed_rows, local_batch, batch = pending.result()
                    if it + 1 < num_iterations:
                        pending = prefetcher.submit(prepare, it + 1)
                    if local_batch is None:
                        logger.warning("entire batch %d failed featurization", it)
                        continue
                    with timers.annotated_stage("dispatch"):
                        out = self.tokenize_fn(self.params, batch)
                    in_flight.append((chunk, failed_rows, local_batch, out))
                    if len(in_flight) >= self.pipeline_depth:
                        fetch_and_save(in_flight.popleft())
                while in_flight:
                    fetch_and_save(in_flight.popleft())
        finally:
            prefetcher.shutdown(wait=False, cancel_futures=True)
        _finish_output_dir(token_save_path)
        timers.log_summary("tokenize stages")
        return results

    # -- decode -------------------------------------------------------------
    def pad_token_rows(
        self, sequences: Sequence[np.ndarray], pad_token_id: Optional[int] = None,
        effective_len: Optional[int] = None,
    ) -> np.ndarray:
        """Right-pad variable-length token sequences to (B, seq_max/df);
        ``effective_len`` overrides the row length (length buckets)."""
        cfg = self.config.data
        pad_id = pad_token_id if pad_token_id is not None else cfg.pad_token_id
        if effective_len is None:
            effective_len = cfg.seq_max_size // cfg.downsampling_ratio
        rows = []
        for seq in sequences:
            seq = np.asarray(seq, np.int32).reshape(-1)[:effective_len]
            rows.append(
                np.pad(seq, (0, effective_len - len(seq)), constant_values=pad_id)
            )
        return np.stack(rows)

    def dispatch_decode(
        self, tokens_ids: np.ndarray, pad_token_id: Optional[int] = None
    ):
        """Enqueue one decode batch: (B, T_tokens) int ids (pad-padded) ->
        (num_nodes (B,), out dict of in-flight device arrays).  Async: fetch
        the outputs with jax.device_get when needed."""
        cfg = self.config.data
        pad_id = pad_token_id if pad_token_id is not None else cfg.pad_token_id
        rows = tokens_ids.shape[0]
        # Mesh sharding needs a mesh.size-divisible leading axis; edge-pad
        # with copies of the last row (rows are independent) and slice back.
        extra = (-rows) % self.mesh.size
        if extra:
            tokens_ids = np.concatenate(
                [tokens_ids, np.repeat(tokens_ids[-1:], extra, axis=0)]
            )
        # The default pad id is baked into the fused decode program; a
        # caller-specific pad id keeps working through the unfused fallback.
        if pad_id == cfg.pad_token_id:
            out = self.decode_tokens_fn(
                self.params,
                mesh_lib.shard_batch(self.mesh, jnp.asarray(tokens_ids)),
            )
            # num_nodes comes from cheap host numpy — no device round-trip.
            tokens_mask = build_tokens_mask_from_sequence(tokens_ids, pad_id)
            nodes_mask = build_nodes_mask_from_tokens_mask(
                tokens_mask, cfg.downsampling_ratio
            )
        else:
            tokens_mask = build_tokens_mask_from_sequence(tokens_ids, pad_id)
            nodes_mask = build_nodes_mask_from_tokens_mask(
                tokens_mask, cfg.downsampling_ratio
            )
            quantized = self.indexes_to_codes_fn(jnp.asarray(tokens_ids))
            out = self.decode_fn(
                self.params,
                mesh_lib.shard_batch(self.mesh, jnp.asarray(quantized)),
                mesh_lib.shard_batch(
                    self.mesh, jnp.asarray(nodes_mask[..., None], dtype=jnp.float32)
                ),
                mesh_lib.shard_batch(
                    self.mesh, jnp.asarray(tokens_mask[..., None], dtype=jnp.float32)
                ),
            )
        if extra:
            out = jax.tree_util.tree_map(lambda x: x[:rows], out)
        return nodes_mask[:rows].sum(axis=-1), out

    def decode_tokens(
        self,
        token_files: Sequence[str],
        structure_save_path: Optional[str] = None,
        *,
        batch_size_per_device: int = 16,
        pad_token_id: Optional[int] = None,
        progress: bool = False,
        profile_dir: Optional[str] = None,
    ) -> dict:
        """Decode token .npy files into backbone structures (and PDB files).

        ``batch_size_per_device`` is the rows-per-dispatch at FULL padding;
        shorter length buckets dispatch proportionally more rows (constant
        device work per dispatch, amortizing per-dispatch latency)."""
        cfg = self.config.data
        timers = StageTimers()
        pad_id = pad_token_id if pad_token_id is not None else cfg.pad_token_id

        structure_dir = None
        if structure_save_path is not None:
            structure_dir = os.path.join(structure_save_path, "structures")
            _make_output_dir(structure_dir)

        global_batch = mesh_lib.global_batch_size(self.mesh, batch_size_per_device)

        token_counts: dict = {}
        if self.length_buckets:
            # Sort by token count so batches stay length-homogeneous; each
            # batch decodes at the smallest node bucket that fits (the pair
            # track is O(N^2), so the bucket win is quadratic here).
            for path in token_files:
                try:
                    token_counts[path] = int(np.load(path).reshape(-1).shape[0])
                except Exception:
                    token_counts[path] = cfg.seq_max_size // cfg.downsampling_ratio
            token_files = sorted(token_files, key=lambda q: (token_counts[q], q))

        def chunk_token_len(chunk) -> Optional[int]:
            if not self.length_buckets:
                return None
            df = cfg.downsampling_ratio
            longest = max(token_counts[q] for q in chunk) * df
            bucket = next(
                (b for b in self.length_buckets if b >= longest), cfg.seq_max_size
            )
            return bucket // df

        # Rows per dispatch scale inversely with the bucket length (device
        # work per dispatch ~ constant): short-chain dispatches would
        # otherwise be bound by per-dispatch latency, not compute (each
        # remote dispatch costs ~25-50 ms through a tunnel and nonzero
        # anywhere).  Chunks are bucket-homogeneous — each file's own bucket
        # decides its run — and tail chunks are filled by cycling the run's
        # files so every bucket compiles exactly one batch shape.
        full_t = cfg.seq_max_size // cfg.downsampling_ratio
        if self.length_buckets:
            chunks = []
            run: list = []
            run_t: Optional[int] = None

            def flush(run, run_t):
                rows = global_batch * max(1, full_t // run_t)
                for i in range(0, len(run), rows):
                    chunk = run[i : i + rows]
                    if len(chunk) < rows:
                        chunk = list(islice(cycle(run), rows))[: rows]
                    chunks.append(chunk)

            for path in token_files:
                t = chunk_token_len([path])
                if run_t is None or t == run_t:
                    run.append(path)
                    run_t = t
                else:
                    flush(run, run_t)
                    run, run_t = [path], t
            if run:
                flush(run, run_t)
        else:
            num_iterations = -(-len(token_files) // global_batch)
            padded = list(islice(cycle(token_files), num_iterations * global_batch))
            chunks = [
                padded[i * global_batch : (i + 1) * global_batch]
                for i in range(num_iterations)
            ]

        results = {}
        iterator = chunks
        if progress:
            try:
                from tqdm import tqdm

                iterator = tqdm(iterator, total=len(chunks))
            except ImportError:
                pass

        def fetch_and_write(entry):
            """Block on one in-flight decode batch and persist the PDBs."""
            chunk, num_nodes, out = entry
            with timers.annotated_stage("device"):
                positions, mask = expand_backbone_atoms(
                    np.asarray(jax.device_get(out["backbone_positions"]))
                )
            with timers.annotated_stage("write_pdb"):
                for row, path in enumerate(chunk):
                    n = int(num_nodes[row])
                    prot = dummy_ala_protein(positions[row, :n], mask[row, :n])
                    name = os.path.basename(path).split("_tokens.npy")[0].split(".npy")[0]
                    results[name] = prot
                    if structure_dir is not None:
                        with open(
                            os.path.join(structure_dir, f"structure_{name}.pdb"), "w"
                        ) as f:
                            f.write(to_pdb(prot))

        # Same two-deep dispatch pipeline as tokenize(): batch i+1 is enqueued
        # before blocking on batch i's coordinates.
        from collections import deque

        in_flight: deque = deque()
        with device_trace(profile_dir):
            for chunk in iterator:
                with timers.annotated_stage("load+mask"):
                    tokens_ids = self.pad_token_rows(
                        [np.load(path) for path in chunk], pad_id,
                        effective_len=chunk_token_len(chunk),
                    )
                with timers.annotated_stage("dispatch"):
                    num_nodes, out = self.dispatch_decode(tokens_ids, pad_id)
                in_flight.append((chunk, num_nodes, out))
                if len(in_flight) >= self.pipeline_depth:
                    fetch_and_write(in_flight.popleft())
            while in_flight:
                fetch_and_write(in_flight.popleft())
        _finish_output_dir(structure_dir)
        timers.log_summary("decode stages")
        return results

    # -- full autoencode ------------------------------------------------------
    def autoencode(
        self,
        pdb_paths: Sequence[str],
        save_path: Optional[str] = None,
        *,
        batch_size_per_device: int = 16,
        compute_metrics: bool = True,
    ) -> dict:
        """PDB -> tokens -> reconstructed structure in ONE device pass.

        Counterpart of the reference's ``prepare_ae_fn``
        (inference_runner.py:210-223) plus its predicted/target PDB and
        ``metrics.pkl`` persistence (protein.py:429-489).  Returns
        {name: {"tokens", "predicted", "target", "metrics"}}.
        """
        import dataclasses as _dc

        from protein_structure_tokenizer_tpu.data.featurize import (
            FeaturizeConfig,
            preprocess_sample,
        )
        from protein_structure_tokenizer_tpu.data.sample import parse_structure_file
        from protein_structure_tokenizer_tpu.data.types import TokenizerBatch
        from protein_structure_tokenizer_tpu.runtime.dataset import collate_features

        cfg = self.config.data

        def make_fcfg(padding: int) -> FeaturizeConfig:
            return FeaturizeConfig(
                num_neighbor=cfg.graph_max_neighbor,
                downsampling_ratio=cfg.downsampling_ratio,
                residue_loc_is_alphac=cfg.graph_residue_loc_is_alphac,
                padding_num_residue=padding,
                crop_index=padding,
            )

        structure_dir = None
        if save_path is not None:
            structure_dir = os.path.join(save_path, "structures")
            os.makedirs(structure_dir, exist_ok=jax.process_index() != 0)

        global_batch = mesh_lib.global_batch_size(self.mesh, batch_size_per_device)

        parsed = {p: parse_structure_file(p) for p in dict.fromkeys(pdb_paths)}
        if self.length_buckets:
            # Same batching as tokenize: length-sorted inputs, each batch
            # padded to the smallest bucket that fits (see tokenize()).
            pdb_paths = sorted(pdb_paths, key=lambda q: (parsed[q].nb_residues, q))

        num_iterations = -(-len(pdb_paths) // global_batch)
        padded_paths = list(islice(cycle(pdb_paths), num_iterations * global_batch))

        results: dict = {}
        all_metrics: dict = {}
        for it in range(num_iterations):
            chunk = padded_paths[it * global_batch : (it + 1) * global_batch]
            samples = [parsed[p] for p in chunk]
            padding = cfg.seq_max_size
            if self.length_buckets:
                longest = max(s_.nb_residues for s_ in samples)
                padding = next(
                    (b for b in self.length_buckets if b >= longest),
                    cfg.seq_max_size,
                )
            fcfg = make_fcfg(padding)
            featurized = [preprocess_sample(s, fcfg) for s in samples]
            graph = pad_tokens_axis(
                collate_graphs([_dc.asdict(g) for g, _ in featurized]),
                self.config.down_sampler.max_out_len,
            )
            features = collate_features([f for _, f in featurized])
            batch = TokenizerBatch(graph=graph, features=features)

            out = self.autoencode_fn(self.params, mesh_lib.shard_batch(self.mesh, batch))
            tokens = np.asarray(jax.device_get(out["tokens"]))
            positions = np.asarray(jax.device_get(out["final_atom_positions"]))
            masks = np.asarray(jax.device_get(out["final_atom_mask"]))

            n_tokens = np.asarray(graph.tokens_mask).reshape(len(chunk), -1).sum(axis=1)
            n_nodes = np.asarray(graph.n_node).reshape(-1)
            for row, path in enumerate(chunk):
                name = os.path.splitext(os.path.basename(path))[0]
                if name in results:
                    continue  # round-robin padding duplicate
                n = int(n_nodes[row])
                target_pos = featurized[row][1]["atom37_gt_positions"][:n]
                target_mask = features["atom37_gt_exists"][row, :n]
                aatype = features["aatype"][row, :n]
                predicted = Protein.from_atom37_rep(
                    atom37_positions=positions[row, :n],
                    atom37_gt_exists=masks[row, :n],
                    atom37_atom_exists=masks[row, :n],
                    aatype=aatype,
                    chain_id="A",
                )
                target = Protein.from_atom37_rep(
                    atom37_positions=target_pos,
                    atom37_gt_exists=target_mask,
                    atom37_atom_exists=target_mask,
                    aatype=aatype,
                    chain_id="A",
                )
                entry = {
                    "tokens": tokens[row, : int(n_tokens[row])],
                    "predicted": predicted,
                    "target": target,
                }
                if compute_metrics:
                    from protein_structure_tokenizer_tpu.eval.metrics import ca_metrics

                    entry["metrics"] = ca_metrics(
                        positions[row, :n].astype(np.float64),
                        target_pos.astype(np.float64),
                    ).as_dict()
                    all_metrics[name] = entry["metrics"]
                results[name] = entry
                if structure_dir is not None:
                    for tag, prot in (("predicted", predicted), ("target", target)):
                        with open(
                            os.path.join(structure_dir, f"{tag}_structure_{name}.pdb"),
                            "w",
                        ) as f:
                            f.write(to_pdb(prot))
        if save_path is not None and compute_metrics and jax.process_index() == 0:
            import pickle

            with open(os.path.join(save_path, "metrics.pkl"), "wb") as f:
                pickle.dump(all_metrics, f)
        return results
