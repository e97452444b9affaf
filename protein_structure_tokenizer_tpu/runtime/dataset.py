"""Training dataset: PDB / preprocessed-npz corpora -> TokenizerBatch stream.

The reference releases no training loop or dataset (SURVEY.md §3.4); this
module supplies the input side of the training stack:

  * sources: raw ``.pdb`` files (featurized on the fly, optionally in a
    process pool) or ``.npz`` files produced by ``DataPipeline.save`` —
    preprocessing once offline and streaming the arrays is the fast path.
  * epoch shuffling with a seeded RNG (deterministic across resumes: the
    stream is reconstructed from (seed, step)).
  * multi-host sharding: every host computes the same global permutation and
    materializes only its ``process_local_slice`` of each global batch,
    mirroring the inference pipeline (parallel/mesh.py:63-82).
"""
from __future__ import annotations

import dataclasses
import logging
import os
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from protein_structure_tokenizer_tpu.data.featurize import (
    FeaturizeConfig,
    filter_out_sample,
    preprocess_sample,
)
from protein_structure_tokenizer_tpu.data.pipeline import DataPipeline
from protein_structure_tokenizer_tpu.data.types import TokenizerBatch
from protein_structure_tokenizer_tpu.runtime.runner import collate_graphs

logger = logging.getLogger(__name__)

# Structure-module ground-truth features consumed by the losses
# (models/losses.py); "aatype"/"atom37_gt_exists" ride along for masks.
FEATURE_KEYS = (
    "aatype",
    "atom37_gt_exists",
    "backbone_affine_tensor",
    "backbone_affine_mask",
    "rigidgroups_gt_frames",
    "rigidgroups_gt_exists",
    "atom14_gt_positions",
    "atom14_gt_exists",
)


def collate_features(features: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack per-sample feature dicts into (B, ...) arrays (float32/int32)."""
    out: Dict[str, np.ndarray] = {}
    for key in FEATURE_KEYS:
        stacked = np.stack([np.asarray(f[key]) for f in features])
        if stacked.dtype in (np.float64,):
            stacked = stacked.astype(np.float32)
        out[key] = stacked
    return out


def _featurize_training_sample(args):
    """Worker: path -> (graph dict, features dict) or None when filtered."""
    path, cfg_dict, seed = args
    cfg = FeaturizeConfig(**cfg_dict)
    if path.endswith(".npz"):
        graph, feats = DataPipeline.load(path)
        return dataclasses.asdict(graph), feats
    from protein_structure_tokenizer_tpu.data.sample import parse_structure_file

    sample = parse_structure_file(path)
    if filter_out_sample(sample, min_number_valid_residues=2,
                         max_number_residues=10**9):
        return None
    rng = np.random.RandomState(seed)  # drives the random crop for long chains
    graph, feats = preprocess_sample(sample, cfg, rng)
    return dataclasses.asdict(graph), feats


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    featurize: FeaturizeConfig = FeaturizeConfig()
    seed: int = 0
    num_workers: int = 0


class StructureDataset:
    """Shuffled, optionally cached stream of TokenizerBatch.

    ``paths`` may mix raw ``.pdb`` files and preprocessed ``.npz`` files.
    Small corpora (e.g. CASP14) are featurized once and cached in memory;
    pass ``cache=False`` to re-featurize each epoch (fresh random crops for
    >512-residue chains).
    """

    def __init__(self, paths: Sequence[str], config: DatasetConfig, *, cache: bool = True):
        if not paths:
            raise ValueError("empty dataset")
        self.paths = list(paths)
        self.config = config
        self.cache = cache
        self._cached: Dict[str, tuple] = {}
        self._pool: Optional[ProcessPoolExecutor] = None

    @classmethod
    def from_dir(cls, directory: str, config: DatasetConfig, **kw) -> "StructureDataset":
        paths = sorted(
            os.path.join(directory, f)
            for f in os.listdir(directory)
            if f.endswith((".pdb", ".npz"))
        )
        return cls(paths, config, **kw)

    def __len__(self) -> int:
        return len(self.paths)

    def _featurize(self, paths: Sequence[str], epoch: int):
        cfg_dict = dataclasses.asdict(self.config.featurize)
        jobs, results = [], {}
        for i, p in enumerate(paths):
            if p in self._cached:
                results[p] = self._cached[p]
            else:
                jobs.append((p, cfg_dict, (self.config.seed + epoch * 1_000_003 + i) % 2**31))
        if jobs:
            if self.config.num_workers > 0:
                if self._pool is None:
                    self._pool = ProcessPoolExecutor(self.config.num_workers)
                done = list(self._pool.map(_featurize_training_sample, jobs))
            else:
                done = [_featurize_training_sample(j) for j in jobs]
            for (p, _, _), r in zip(jobs, done):
                if r is None:
                    logger.warning("sample filtered out: %s", p)
                results[p] = r
                if self.cache:
                    self._cached[p] = r
        return [results[p] for p in paths]

    def batches(
        self, global_batch: int, *, start_step: int = 0, local: slice = slice(None)
    ) -> Iterator[TokenizerBatch]:
        """Infinite stream of collated batches.

        ``start_step`` fast-forwards the permutation stream for resume;
        ``local`` selects this host's rows of each global batch.
        """
        step = 0
        epoch = 0
        while True:
            order = np.random.RandomState(self.config.seed + epoch).permutation(len(self.paths))
            # Round the epoch up to whole global batches by wrapping.
            n_batches = max(1, -(-len(order) // global_batch))
            padded = np.resize(order, n_batches * global_batch)
            for b in range(n_batches):
                if step < start_step:
                    step += 1
                    continue
                idx = padded[b * global_batch : (b + 1) * global_batch][local]
                feats = self._featurize([self.paths[i] for i in idx], epoch)
                feats = [f for f in feats if f is not None]
                if not feats:
                    continue
                graph = collate_graphs([g for g, _ in feats])
                features = collate_features([f for _, f in feats])
                yield TokenizerBatch(graph=graph, features=features)
                step += 1
            epoch += 1
