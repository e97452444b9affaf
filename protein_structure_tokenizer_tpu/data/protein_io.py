"""Protein record + PDB text writer.

Counterpart of /root/reference/structure_tokenizer/data/protein.py:39-296:
the ``Protein`` dataclass, ``from_atom37_rep`` and a columnar PDB writer whose
output layout matches the reference's (so downstream TM-score tooling parses
both identically).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from protein_structure_tokenizer_tpu.data import constants

PDB_CHAIN_IDS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
PDB_MAX_CHAINS = len(PDB_CHAIN_IDS)


@dataclasses.dataclass(frozen=True)
class Protein:
    atom_positions: np.ndarray  # (N, 37, 3)
    aatype: np.ndarray  # (N,) int, 20 == 'X'
    atom_mask: np.ndarray  # (N, 37)
    residue_index: np.ndarray  # (N,)
    chain_index: np.ndarray  # (N,)
    b_factors: np.ndarray  # (N, 37)

    def __post_init__(self):
        if len(np.unique(self.chain_index)) > PDB_MAX_CHAINS:
            raise ValueError("too many chains for the PDB format")

    def get_sequence(self) -> str:
        assert len(np.unique(self.chain_index)) == 1
        return "".join(constants.RESTYPES_WITH_X[a] for a in self.aatype)

    @classmethod
    def from_atom37_rep(
        cls,
        atom37_positions: np.ndarray,
        atom37_gt_exists: np.ndarray,
        atom37_atom_exists: np.ndarray,
        aatype: np.ndarray,  # (N, 20|21) one-hot
        chain_id: str = "A",
    ) -> "Protein":
        assert chain_id in PDB_CHAIN_IDS
        assert aatype.ndim == 2 and aatype.shape[1] in (20, 21)
        chain_index = PDB_CHAIN_IDS.find(chain_id)
        n = aatype.shape[0]
        return cls(
            atom_positions=np.asarray(atom37_positions),
            atom_mask=np.logical_and(atom37_atom_exists, atom37_gt_exists),
            aatype=np.where(np.asarray(aatype))[1],
            residue_index=np.arange(n),
            chain_index=np.full((n,), chain_index),
            b_factors=np.zeros(np.asarray(atom37_gt_exists).shape),
        )


def _chain_end(atom_index, end_resname, chain_name, residue_index) -> str:
    return (
        f"{'TER':<6}{atom_index:>5}      {end_resname:>3} "
        f"{chain_name:>1}{residue_index:>4}"
    )


def to_pdb(prot: Protein) -> str:
    """Protein -> PDB text (column layout identical to the reference writer)."""
    res_1to3 = lambda r: constants.RESTYPE_1TO3.get(  # noqa: E731
        constants.RESTYPES_WITH_X[r], "UNK"
    )

    atom_mask = prot.atom_mask
    aatype = prot.aatype
    atom_positions = prot.atom_positions
    residue_index = prot.residue_index.astype(np.int32)
    chain_index = prot.chain_index.astype(np.int32)
    b_factors = prot.b_factors

    if np.any(aatype > constants.RESTYPE_NUM):
        raise ValueError("Invalid aatypes.")

    chain_ids = {i: PDB_CHAIN_IDS[i] for i in np.unique(chain_index)}

    lines = ["MODEL     1"]
    atom_index = 1
    last_chain_index = chain_index[0]
    for i in range(aatype.shape[0]):
        if last_chain_index != chain_index[i]:
            lines.append(
                _chain_end(
                    atom_index,
                    res_1to3(aatype[i - 1]),
                    chain_ids[chain_index[i - 1]],
                    residue_index[i - 1],
                )
            )
            last_chain_index = chain_index[i]
            atom_index += 1

        res_name_3 = res_1to3(aatype[i])
        for atom_name, pos, mask, b_factor in zip(
            constants.ATOM_TYPES, atom_positions[i], atom_mask[i], b_factors[i]
        ):
            if mask < 0.5:
                continue
            name = atom_name if len(atom_name) == 4 else f" {atom_name}"
            element = atom_name[0]
            lines.append(
                f"{'ATOM':<6}{atom_index:>5} {name:<4}{'':>1}"
                f"{res_name_3:>3} {chain_ids[chain_index[i]]:>1}"
                f"{residue_index[i]:>4}{'':>1}   "
                f"{pos[0]:>8.3f}{pos[1]:>8.3f}{pos[2]:>8.3f}"
                f"{1.00:>6.2f}{b_factor:>6.2f}          "
                f"{element:>2}{'':>2}"
            )
            atom_index += 1

    lines.append(
        _chain_end(
            atom_index,
            res_1to3(aatype[-1]),
            chain_ids[chain_index[-1]],
            residue_index[-1],
        )
    )
    lines.append("ENDMDL")
    lines.append("END")
    return "\n".join(line.ljust(80) for line in lines) + "\n"


def save_pdb(prot: Protein, path: str) -> None:
    with open(path, "w") as f:
        f.write(to_pdb(prot))
