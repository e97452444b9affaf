"""Production inference serving: continuous micro-batching over HTTP.

The reference is batch-script-only (tokenize a directory, exit —
/root/reference/scripts/tokenize_pdb.py); a deployed tokenizer needs an
always-on service.  The economics on TPU are specific: a single dispatch
costs fixed latency (queueing + program launch — ~tens of ms through a
remote runtime) regardless of batch size, and the compiled executable wants
ONE static shape.  So the server:

  * keeps one jitted executable per op at a fixed ``(max_batch, seq_max)``
    shape (no recompiles, ever);
  * runs a scheduler thread with **continuous micro-batching**: the first
    request opens a window of ``max_wait_ms``; everything that arrives in
    the window rides the same dispatch (padded to ``max_batch`` with repeats,
    per-request rows sliced back out);
  * featurizes in the HTTP handler threads (CPU work overlaps the device)
    and keeps the device queue two-deep like the batch runner.

Endpoints (JSON unless noted):
  POST /tokenize   body = PDB text           -> {"tokens": [...]}
  POST /decode     {"tokens": [...]}         -> PDB text
  POST /generate   {"num_tokens": N, ...}    -> {"tokens": [[...], ...]}
  GET  /healthz                              -> {"status": "ok"}
  GET  /stats                                -> counters + latency percentiles
"""
from __future__ import annotations

import collections
import dataclasses
import json
import logging
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from protein_structure_tokenizer_tpu.parallel import mesh as mesh_lib
from protein_structure_tokenizer_tpu.data.featurize import (
    FeaturizeConfig,
    preprocess_sample,
)
from protein_structure_tokenizer_tpu.data.sample import parse_pdb_string
from protein_structure_tokenizer_tpu.runtime.runner import (
    InferenceRunner,
    collate_graphs,
    pad_tokens_axis,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    batched_rows: int = 0
    errors: int = 0
    # Bounded: an always-on server must not grow per-request state forever.
    latencies_ms: "collections.deque[float]" = dataclasses.field(
        default_factory=lambda: collections.deque(maxlen=4096)
    )

    def snapshot(self) -> dict:
        lat = sorted(self.latencies_ms)

        def pct(p):
            return round(lat[min(len(lat) - 1, int(p * len(lat)))], 2) if lat else None

        return {
            "requests": self.requests,
            "batches": self.batches,
            "mean_batch_size": round(self.batched_rows / self.batches, 2)
            if self.batches else None,
            "errors": self.errors,
            "latency_ms": {"p50": pct(0.50), "p95": pct(0.95), "p99": pct(0.99)},
        }


class _Request:
    __slots__ = ("payload", "future", "t_enqueue")

    def __init__(self, payload):
        self.payload = payload
        self.future: Future = Future()
        self.t_enqueue = time.perf_counter()


class BatchingEngine:
    """Continuous micro-batching scheduler over an :class:`InferenceRunner`.

    One queue + scheduler thread per op keeps tokenize and decode windows
    independent (a slow decode batch never delays tokenize dispatches; the
    device serializes the executables anyway).
    """

    def __init__(
        self,
        runner: InferenceRunner,
        *,
        max_batch: int = 8,
        max_wait_ms: float = 10.0,
    ):
        self.runner = runner
        n_data = int(np.prod([runner.mesh.shape[a] for a in runner.mesh.axis_names
                              if a == "data"])) or 1
        if max_batch % n_data:
            max_batch = -(-max_batch // n_data) * n_data  # round up: shardable
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.stats = ServerStats()
        self._lock = threading.Lock()
        self._queues = {"tokenize": queue.Queue(), "decode": queue.Queue()}
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(
                target=self._loop, args=(op,), name=f"batcher-{op}", daemon=True
            )
            for op in self._queues
        ]
        for t in self._threads:
            t.start()

    # -- public API -----------------------------------------------------------
    def tokenize_pdb_string(self, pdb_string: str) -> np.ndarray:
        """PDB text -> (n_tokens,) uint32.  Featurization runs on the CALLING
        thread (handler threads overlap CPU featurize with device compute)."""
        cfg = self.runner.config.data
        sample = parse_pdb_string(pdb_string)
        if sample.nb_residues > cfg.seq_max_size:
            raise ValueError(
                f"protein has {sample.nb_residues} residues > seq_max "
                f"{cfg.seq_max_size}"
            )
        if sample.nb_residues < cfg.graph_max_neighbor:
            raise ValueError(
                f"protein has {sample.nb_residues} residues < k "
                f"{cfg.graph_max_neighbor}"
            )
        padding = self._bucket_for(sample.nb_residues)
        graph, _ = preprocess_sample(
            sample,
            FeaturizeConfig(
                num_neighbor=cfg.graph_max_neighbor,
                downsampling_ratio=cfg.downsampling_ratio,
                residue_loc_is_alphac=cfg.graph_residue_loc_is_alphac,
                padding_num_residue=padding,
                crop_index=padding,
            ),
        )
        return self._submit("tokenize", (padding, graph))

    def decode_tokens(self, tokens: Sequence[int]) -> dict:
        """Token ids -> {"final_atom_positions": (N,37,3), "final_atom_mask",
        "n_residues"}."""
        cfg = self.runner.config.data
        arr = np.asarray(tokens, np.int32)
        bucket = self._bucket_for(arr.reshape(-1).shape[0] * cfg.downsampling_ratio)
        return self._submit("decode", (bucket, arr))

    def _bucket_for(self, num_residues: int) -> int:
        """Smallest length bucket fitting the request (serving latency: a
        128-residue request dispatches a 128-shaped executable, not 512)."""
        buckets = self.runner.length_buckets
        seq_max = self.runner.config.data.seq_max_size
        if not buckets:
            return seq_max
        return next((b for b in buckets if b >= num_residues), seq_max)

    def close(self):
        self._stop.set()
        for q in self._queues.values():
            q.put(None)  # wake the scheduler
        for t in self._threads:
            t.join(timeout=5)

    # -- scheduler ------------------------------------------------------------
    def _submit(self, op: str, payload):
        req = _Request(payload)
        self._queues[op].put(req)
        result = req.future.result()
        with self._lock:
            self.stats.requests += 1
            self.stats.latencies_ms.append(
                (time.perf_counter() - req.t_enqueue) * 1e3
            )
        if isinstance(result, Exception):
            raise result
        return result

    def _loop(self, op: str):
        q = self._queues[op]
        while not self._stop.is_set():
            first = q.get()
            if first is None:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_wait_s
            while len(batch) < self.max_batch:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                try:
                    nxt = q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                batch.append(nxt)
            try:
                results = (
                    self._run_tokenize(batch) if op == "tokenize"
                    else self._run_decode(batch)
                )
                for req, res in zip(batch, results):
                    req.future.set_result(res)
            except Exception as e:  # noqa: BLE001 — a bad batch must not kill the server
                logger.exception("batch %s failed", op)
                with self._lock:
                    self.stats.errors += len(batch)
                for req in batch:
                    req.future.set_result(e)
            with self._lock:
                self.stats.batches += 1
                self.stats.batched_rows += len(batch)

    def _pad_rows(self, items: list) -> list:
        """Repeat the last row up to max_batch: the executable has ONE shape."""
        return items + [items[-1]] * (self.max_batch - len(items))

    @staticmethod
    def _bucket_groups(batch: List[_Request]):
        """Group request indices by their payload's length bucket — one
        static-shape dispatch per bucket present in the window."""
        groups: dict = {}
        for i, req in enumerate(batch):
            bucket, _ = req.payload
            groups.setdefault(bucket, []).append(i)
        return groups

    def _run_tokenize(self, batch: List[_Request]) -> List[np.ndarray]:
        import dataclasses as dc

        results: List = [None] * len(batch)
        for bucket, idxs in self._bucket_groups(batch).items():
            graphs = self._pad_rows(
                [dc.asdict(batch[i].payload[1]) for i in idxs]
            )
            collated = pad_tokens_axis(
                collate_graphs(graphs), self.runner.config.down_sampler.max_out_len
            )
            device_batch = mesh_lib.shard_batch(self.runner.mesh, collated)
            out = self.runner.tokenize_fn(self.runner.params, device_batch)
            tokens = np.asarray(jax.device_get(out["tokens"]))
            tokens_mask = np.asarray(collated.tokens_mask)
            for row, i in enumerate(idxs):
                n = int(tokens_mask[row].sum())
                results[i] = tokens[row, :n].astype(np.uint32)
        return results

    def _run_decode(self, batch: List[_Request]) -> List[dict]:
        cfg = self.runner.config.data
        results: List = [None] * len(batch)
        for bucket, idxs in self._bucket_groups(batch).items():
            rows = self.runner.pad_token_rows(
                self._pad_rows([batch[i].payload[1] for i in idxs]),
                effective_len=bucket // cfg.downsampling_ratio,
            )
            num_nodes, out = self.runner.dispatch_decode(rows)
            from protein_structure_tokenizer_tpu.runtime.runner import (
                expand_backbone_atoms,
            )

            pos, mask = expand_backbone_atoms(
                np.asarray(jax.device_get(out["backbone_positions"]))
            )
            for row, i in enumerate(idxs):
                n = int(num_nodes[row])
                results[i] = {
                    "final_atom_positions": pos[row, :n],
                    "final_atom_mask": mask[row, :n],
                    "n_residues": n,
                }
        return results


class InferenceServer:
    """HTTP front end over a :class:`BatchingEngine` (+ optional GPT)."""

    def __init__(
        self,
        engine: BatchingEngine,
        *,
        host: str = "127.0.0.1",
        port: int = 8000,
        gpt_params=None,
        gpt_config=None,
        sampling_defaults: Optional[dict] = None,
    ):
        self.engine = engine
        self.gpt_params = gpt_params
        self.gpt_config = gpt_config
        self.sampling_defaults = sampling_defaults or {}
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # route through logging
                logger.debug("http: " + fmt, *args)

            def _send(self, code: int, body: bytes, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _send_json(self, code: int, obj):
                self._send(code, json.dumps(obj).encode())

            def do_GET(self):
                if self.path == "/healthz":
                    self._send_json(200, {"status": "ok"})
                elif self.path == "/stats":
                    with server.engine._lock:
                        snap = server.engine.stats.snapshot()
                    self._send_json(200, snap)
                else:
                    self._send_json(404, {"error": f"unknown path {self.path}"})

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                try:
                    if self.path == "/tokenize":
                        tokens = server.engine.tokenize_pdb_string(body.decode())
                        self._send_json(200, {"tokens": tokens.tolist()})
                    elif self.path == "/decode":
                        payload = json.loads(body)
                        out = server.engine.decode_tokens(payload["tokens"])
                        pdb_text = server._to_pdb(out)
                        self._send(200, pdb_text.encode(), ctype="chemical/x-pdb")
                    elif self.path == "/generate":
                        payload = json.loads(body) if body else {}
                        self._send_json(200, server._generate(payload))
                    elif self.path == "/score":
                        payload = json.loads(body) if body else {}
                        self._send_json(200, server._score(payload))
                    else:
                        self._send_json(404, {"error": f"unknown path {self.path}"})
                except Exception as e:  # noqa: BLE001 — per-request isolation
                    logger.exception("request %s failed", self.path)
                    self._send_json(400, {"error": str(e)})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def _to_pdb(self, decode_out: dict) -> str:
        from protein_structure_tokenizer_tpu.data.protein_io import to_pdb
        from protein_structure_tokenizer_tpu.runtime.runner import dummy_ala_protein

        return to_pdb(
            dummy_ala_protein(
                decode_out["final_atom_positions"], decode_out["final_atom_mask"]
            )
        )

    def _check_token_ids(self, arr: np.ndarray, what: str) -> None:
        """Reject out-of-range / special token ids in client payloads: the
        embedding gather clamps silently (wrong conditioning / likelihoods
        instead of an error), and a prompted EOS under the serving default
        stop_at_eos=True ends every row after one step."""
        cfg = self.gpt_config
        n_structure = min(cfg.bos_token_id, cfg.eos_token_id, cfg.pad_token_id)
        if arr.size and not np.issubdtype(arr.dtype, np.integer):
            if not np.all(arr == arr.astype(np.int64)):
                raise ValueError(f"{what}: token ids must be integers")
        a = arr.astype(np.int64, copy=False)
        if arr.size and (a.min() < 0 or a.max() >= n_structure):
            raise ValueError(
                f"{what}: token ids must be structure tokens in "
                f"[0, {n_structure}) — BOS/EOS/PAD are framed server-side"
            )

    def _score(self, payload: dict) -> dict:
        """LM log-likelihood / perplexity of token rows (lm.scoring):
        ``{"sequences": [[...], ...]}`` — raw structure-token rows, framed
        BOS+row+EOS server-side."""
        if self.gpt_params is None:
            raise ValueError("server started without GPT weights (--gpt_weights)")
        from protein_structure_tokenizer_tpu.lm import scoring

        rows = payload.get("sequences")
        if not rows:
            raise ValueError('payload must carry {"sequences": [[token ids], ...]}')
        for i, r in enumerate(rows):
            self._check_token_ids(np.asarray(r), f"sequences[{i}]")
        framed = scoring.frame_rows(
            [np.asarray(r, np.int32) for r in rows], self.gpt_config
        )
        out = scoring.score_sequences(self.gpt_params, self.gpt_config, framed)
        return {
            "log_likelihood": np.asarray(out["log_likelihood"]).tolist(),
            "perplexity": np.asarray(out["perplexity"]).tolist(),
            "num_scored": np.asarray(out["num_scored"]).astype(int).tolist(),
        }

    def _generate(self, payload: dict) -> dict:
        if self.gpt_params is None:
            raise ValueError("server started without GPT weights (--gpt_weights)")
        import jax

        from protein_structure_tokenizer_tpu.lm import sampling

        opts = {**self.sampling_defaults, **payload}
        num = int(opts.get("num_sequences", 1))
        seed = int(opts.get("seed", time.time_ns() % (1 << 31)))
        prompt = opts.get("prompt")  # flat list of structure-token ids
        if prompt is not None:
            self._check_token_ids(np.asarray(prompt), "prompt")
            prompt = np.tile(
                np.asarray(prompt, np.int32).reshape(1, -1), (num, 1)
            )
        toks = sampling.generate(
            self.gpt_params,
            self.gpt_config,
            jax.random.PRNGKey(seed),
            batch_size=num,
            num_tokens=int(opts.get("num_tokens",
                                    self.gpt_config.max_position_embeddings)),
            method=opts.get("sampling_method", "temperature"),
            # serving default: stop as soon as every row has an EOS — the
            # post-EOS tail is stripped below anyway
            stop_at_eos=bool(opts.get("stop_at_eos", True)),
            # int8 KV cache (cli.serve --gpt_int8 sets the default; see
            # lm/quant.py for the weight half of the recipe)
            int8_kv=bool(opts.get("int8_kv", False)),
            # prefix completion: every sampled row continues the prompt
            prompt=prompt,
            temperature=float(opts.get("temperature", 0.6)),
            k=int(opts.get("top_k", 4)),
            top_p=float(opts.get("top_p", 0.15)),
        )
        arr = np.asarray(toks)
        out = [
            sampling.strip_special_tokens(
                row, self.gpt_config.bos_token_id, self.gpt_config.eos_token_id
            ).tolist()
            for row in arr
        ]
        return {"tokens": out, "seed": seed}

    def serve_forever(self):
        logger.info("serving on port %d", self.port)
        self.httpd.serve_forever()

    def start_background(self):
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, name="http-server", daemon=True
        )
        self._thread.start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
        self.engine.close()
