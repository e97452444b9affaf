"""lDDT (local Distance Difference Test) scorer.

In-repo replacement for the reference's optional OpenStructure ``lddt``
binary wrapper (/root/reference/structure_tokenizer/data/tools/lddt.py:26-165;
the binary install is disabled in its Dockerfile).  Standard definition:
fraction of reference interatomic distances (different residues, within the
15 A inclusion radius) preserved within {0.5, 1, 2, 4} A, averaged over the
four thresholds; reported globally and per residue.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from protein_structure_tokenizer_tpu.data import constants

THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
INCLUSION_RADIUS = 15.0


def lddt(
    pred_positions: np.ndarray,  # (A, 3) model atom coordinates
    target_positions: np.ndarray,  # (A, 3) reference atom coordinates
    residue_index: np.ndarray,  # (A,) residue id per atom
    mask: Optional[np.ndarray] = None,  # (A,) atom validity
) -> Tuple[float, np.ndarray]:
    """Returns (global lDDT, per-residue lDDT). Superposition-free."""
    a = len(target_positions)
    if mask is None:
        mask = np.ones((a,), bool)
    mask = mask.astype(bool)

    t_dist = np.linalg.norm(
        target_positions[:, None] - target_positions[None, :], axis=-1
    )
    p_dist = np.linalg.norm(pred_positions[:, None] - pred_positions[None, :], axis=-1)

    pair_mask = (
        (t_dist < INCLUSION_RADIUS)
        & (residue_index[:, None] != residue_index[None, :])
        & mask[:, None]
        & mask[None, :]
    )

    delta = np.abs(t_dist - p_dist)
    preserved = sum((delta < thr).astype(np.float64) for thr in THRESHOLDS) / len(
        THRESHOLDS
    )

    residues = np.unique(residue_index[mask])
    per_residue = np.zeros(len(residues))
    for k, res in enumerate(residues):
        rows = (residue_index == res) & mask
        m = pair_mask[rows]
        per_residue[k] = preserved[rows][m].mean() if m.any() else 0.0

    total = pair_mask.sum()
    global_lddt = float(preserved[pair_mask].sum() / total) if total else 0.0
    return global_lddt, per_residue


def lddt_from_atom37(
    pred_atom37: np.ndarray,  # (N, 37, 3)
    target_atom37: np.ndarray,
    atom_mask: np.ndarray,  # (N, 37)
    *,
    ca_only: bool = False,
) -> Dict[str, object]:
    n = pred_atom37.shape[0]
    if ca_only:
        atoms = [constants.CA_INDEX]
    else:
        atoms = list(range(37))
    sel_mask = np.zeros_like(atom_mask, bool)
    sel_mask[:, atoms] = True
    sel_mask &= atom_mask.astype(bool)

    flat_idx = np.nonzero(sel_mask)
    pred = pred_atom37[flat_idx]
    target = target_atom37[flat_idx]
    residue_index = flat_idx[0]
    global_score, per_res = lddt(pred, target, residue_index)
    return {"global_lddt": global_score, "per_residue_lddt": per_res}
