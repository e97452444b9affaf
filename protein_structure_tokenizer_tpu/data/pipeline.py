"""Standalone data pipeline: parse -> validate -> featurize -> save.

Counterpart of the reference's user-facing DataPipeline
(/root/reference/data_pipeline.py:37-357): load structures from PDB
file/string or saved .npy samples, validate/filter, preprocess into padded
graph + structure-module features, and persist as npy/npz.
"""
from __future__ import annotations

import dataclasses
import logging
import os
from typing import Dict, Optional, Tuple

import numpy as np

from protein_structure_tokenizer_tpu.data.featurize import (
    FeaturizeConfig,
    GraphFeatures,
    filter_out_sample,
    preprocess_sample,
)
from protein_structure_tokenizer_tpu.data.sample import (
    ProteinSample,
    parse_cif_string,
    parse_pdb_string,
    parse_structure_file,
)

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    featurize: FeaturizeConfig = FeaturizeConfig()
    min_number_valid_residues: int = 50
    max_number_residues: int = 512


class DataPipeline:
    """Host-side preprocessing pipeline with persistence."""

    def __init__(self, config: Optional[PipelineConfig] = None):
        self.config = config or PipelineConfig()

    # -- loading -------------------------------------------------------------
    def load_from_pdb_file(self, path: str, chain_id: Optional[str] = None) -> ProteinSample:
        return parse_structure_file(path, chain_id)

    def load_from_pdb_string(self, pdb: str, chain_id: Optional[str] = None) -> ProteinSample:
        return parse_pdb_string(pdb, chain_id)

    def load_from_cif_string(self, cif: str, chain_id: Optional[str] = None) -> ProteinSample:
        return parse_cif_string(cif, chain_id)

    def load_from_npy(self, path: str) -> ProteinSample:
        return ProteinSample.from_file(path)

    # -- validation ----------------------------------------------------------
    def validate_sample(self, sample: ProteinSample) -> None:
        if filter_out_sample(
            sample,
            self.config.min_number_valid_residues,
            self.config.max_number_residues,
        ):
            missing = sample.get_missing_backbone_coords_mask()
            raise ValueError(
                f"sample rejected: {int((~missing).sum())} residues with full "
                f"backbone (min {self.config.min_number_valid_residues}), "
                f"{sample.nb_residues} total (max {self.config.max_number_residues})"
            )

    def info(self, sample: ProteinSample) -> Dict[str, object]:
        missing = sample.get_missing_backbone_coords_mask()
        return {
            "nb_residues": sample.nb_residues,
            "residues_with_backbone": int((~missing).sum()),
            "chain_id": sample.chain_id,
            "passes_filter": not filter_out_sample(
                sample,
                self.config.min_number_valid_residues,
                self.config.max_number_residues,
            ),
        }

    # -- preprocessing ---------------------------------------------------------
    def preprocess(self, sample: ProteinSample) -> Tuple[GraphFeatures, Dict[str, np.ndarray]]:
        return preprocess_sample(sample, self.config.featurize)

    # -- persistence -----------------------------------------------------------
    def save(self, graph: GraphFeatures, features: Dict[str, np.ndarray], path: str) -> None:
        arrays = {f"graph::{k}": np.asarray(v) for k, v in dataclasses.asdict(graph).items()}
        arrays.update({f"features::{k}": np.asarray(v) for k, v in features.items()})
        np.savez(path, **arrays)

    @staticmethod
    def load(path: str) -> Tuple[GraphFeatures, Dict[str, np.ndarray]]:
        data = np.load(path, allow_pickle=False)
        graph_kwargs, features = {}, {}
        for key in data.files:
            kind, name = key.split("::", 1)
            if kind == "graph":
                graph_kwargs[name] = data[key]
            else:
                features[name] = data[key]
        graph_kwargs["canonical_receivers"] = bool(graph_kwargs["canonical_receivers"])
        return GraphFeatures(**graph_kwargs), features

    # -- end-to-end ------------------------------------------------------------
    def process_single(
        self, pdb_path: str, output_path: Optional[str] = None, chain_id: Optional[str] = None
    ):
        sample = self.load_from_pdb_file(pdb_path, chain_id)
        self.validate_sample(sample)
        graph, features = self.preprocess(sample)
        if output_path:
            self.save(graph, features, output_path)
        return graph, features

    def process_batch(self, pdb_paths, output_dir: str, chain_id: Optional[str] = None):
        os.makedirs(output_dir, exist_ok=True)
        results = {}
        for path in pdb_paths:
            name = os.path.splitext(os.path.basename(path))[0]
            try:
                out = os.path.join(output_dir, name + ".npz")
                self.process_single(path, out, chain_id)
                results[name] = out
            except Exception as exc:
                logger.error("failed to process %s: %s", path, exc)
                results[name] = None
        return results
