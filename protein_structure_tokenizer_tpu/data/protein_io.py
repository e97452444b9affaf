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


def from_pdb_string(pdb_str: str, chain_id: str | None = None) -> Protein:
    """PDB text -> Protein (reference protein.py:114-189 semantics).

    First/only model; optional single-chain filter; insertion codes rejected;
    non-standard residues (incl. HETATM hetero residues such as MSE — the
    reference's BioPython loop iterates those too) become X; atoms outside the
    37-type vocabulary are ignored; residues with no recognized atoms are
    skipped; alternate locations keep the highest-occupancy conformer
    (BioPython's disordered-atom default); original residue numbering and
    per-atom B-factors are preserved; chain letters map to ints in
    sorted-unique order.  Fixed-column reader (no BioPython), same idiom as
    data/sample.parse_pdb_string.
    """
    import io

    residues: dict[tuple, dict] = {}
    order: list[tuple] = []
    num_models = 0
    for line in io.StringIO(pdb_str):
        record = line[:6]
        if record == "MODEL ":
            num_models += 1
            if num_models > 1:
                raise ValueError(
                    f"Only single model PDBs are supported. Found {num_models} models."
                )
        elif record in ("ATOM  ", "HETATM"):
            atom_name = line[12:16].strip()
            altloc = line[16]
            resname = line[17:20].strip()
            chain = line[21]
            if chain_id is not None and chain != chain_id:
                continue
            try:
                resseq = int(line[22:26])
            except ValueError:
                continue
            if line[26] != " ":
                raise ValueError(
                    f"PDB contains an insertion code at chain {chain} and residue "
                    f"index {resseq}. These are not supported."
                )
            key = (chain, resseq)
            if key not in residues:
                residues[key] = {"resname": resname, "atoms": {}}
                order.append(key)
            if atom_name not in constants.ATOM_ORDER:
                continue
            coord = np.array(
                [float(line[30:38]), float(line[38:46]), float(line[46:54])]
            )
            try:
                occupancy = float(line[54:60])
            except ValueError:
                occupancy = 1.0
            try:
                bfac = float(line[60:66])
            except ValueError:
                bfac = 0.0
            atoms = residues[key]["atoms"]
            if atom_name in atoms and altloc != " " and occupancy <= atoms[atom_name][2]:
                continue
            atoms[atom_name] = (coord, bfac, occupancy)

    aatype, positions, masks, res_index, chains, bfactors = [], [], [], [], [], []
    for chain, resseq in order:
        res = residues[(chain, resseq)]
        if not res["atoms"]:
            continue
        shortname = constants.RESTYPE_3TO1.get(res["resname"], "X")
        pos = np.zeros((37, 3))
        mask = np.zeros((37,))
        bfac = np.zeros((37,))
        for name, (coord, b, _) in res["atoms"].items():
            idx = constants.ATOM_ORDER[name]
            pos[idx], mask[idx], bfac[idx] = coord, 1.0, b
        aatype.append(constants.RESTYPE_ORDER.get(shortname, constants.RESTYPE_NUM))
        positions.append(pos)
        masks.append(mask)
        bfactors.append(bfac)
        res_index.append(resseq)
        chains.append(chain)

    chain_map = {c: i for i, c in enumerate(sorted(set(chains)))}
    return Protein(
        atom_positions=np.asarray(positions),
        aatype=np.asarray(aatype),
        atom_mask=np.asarray(masks),
        residue_index=np.asarray(res_index),
        chain_index=np.asarray([chain_map[c] for c in chains]),
        b_factors=np.asarray(bfactors),
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
