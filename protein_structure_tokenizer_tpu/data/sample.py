"""Protein structure samples: the parsed, featurization-ready representation.

Feature parity with /root/reference/structure_tokenizer/data/
protein_structure_sample.py (ProteinStructureSample 27-163 and the
BioPython-based parser 166-248) — but the PDB parser here is our own
fixed-column reader (no BioPython dependency), validated against the
reference parser on the CASP14 corpus.
"""
from __future__ import annotations

import dataclasses
import io
import os
from typing import Dict, List, Optional

import numpy as np

from protein_structure_tokenizer_tpu.data import constants, frames_np


@dataclasses.dataclass(frozen=True)
class ProteinSample:
    chain_id: Optional[str]
    nb_residues: int
    aatype: np.ndarray  # (N, 21) float32 one-hot
    atom37_positions: np.ndarray  # (N, 37, 3) float64
    atom37_gt_exists: np.ndarray  # (N, 37) bool — atom resolved in the entry
    atom37_atom_exists: np.ndarray  # (N, 37) bool — atom exists for the residue type
    resolution: float = 0.0
    pdb_cluster_size: int = 1

    # -- persistence (npy dict round-trip, same layout as the reference) ----
    @classmethod
    def from_file(cls, filepath: str) -> "ProteinSample":
        if not os.path.isfile(filepath):
            raise FileNotFoundError(filepath)
        with open(filepath, "rb") as f:
            d = np.load(f, allow_pickle=True)[()]
        return cls(**d)

    def to_file(self, filepath: str) -> None:
        np.save(filepath, dataclasses.asdict(self))

    # -- masks / features ---------------------------------------------------
    def get_missing_backbone_coords_mask(self) -> np.ndarray:
        e = self.atom37_gt_exists
        return ~(
            e[:, constants.CA_INDEX]
            & e[:, constants.N_INDEX]
            & e[:, constants.C_INDEX]
            & e[:, constants.O_INDEX]
        )

    def make_protein_features(self) -> Dict[str, np.ndarray]:
        """Ground-truth features for the structure module / losses.

        Replicates the reference's quirks exactly, including the O<->C slot
        swap in its atom14 backbone layout (protein_structure_sample.py:104-110).
        """
        n = self.nb_residues
        feats: Dict[str, np.ndarray] = {
            "aatype": self.aatype,
            "atom37_gt_positions": self.atom37_positions,
        }
        a37 = {k: constants.ATOM_ORDER[k] for k in ("N", "CA", "C", "O")}
        # Quirk: 'O' goes to the C slot and 'C' to the O slot.
        a14 = {
            "N": constants.ATOM_ORDER["N"],
            "CA": constants.ATOM_ORDER["CA"],
            "O": constants.ATOM_ORDER["C"],
            "C": constants.ATOM_ORDER["O"],
        }
        atom37_gt = np.zeros((n, 37), dtype=np.int32)
        atom37_exists = np.zeros((n, 37), dtype=np.int32)
        for idx in a14.values():
            atom37_gt[:, idx] = self.atom37_gt_exists[:, idx]
            atom37_exists[:, idx] = self.atom37_atom_exists[:, idx]
        feats["atom37_gt_exists"] = atom37_gt
        feats["atom37_atom_exists"] = atom37_exists

        atom14_pos = np.zeros((n, 14, 3), dtype=np.float32)
        atom14_exists = np.zeros((n, 14), dtype=np.int32)
        for atom in ("N", "CA", "C", "O"):
            atom14_pos[:, a14[atom]] = self.atom37_positions[:, a37[atom]]
            atom14_exists[:, a14[atom]] = self.atom37_gt_exists[:, a37[atom]]
        feats["atom14_gt_positions"] = atom14_pos
        feats["atom14_gt_exists"] = atom14_exists

        rot, trans = frames_np.make_transform_from_reference(
            n_xyz=self.atom37_positions[:, a37["N"]],
            ca_xyz=self.atom37_positions[:, a37["CA"]],
            c_xyz=self.atom37_positions[:, a37["C"]],
        )
        quats = frames_np.rot_to_quat(rot)
        feats["backbone_affine_tensor"] = np.concatenate([quats, trans], axis=-1)
        feats["backbone_affine_mask"] = (
            self.atom37_gt_exists[:, a37["N"]].astype(np.float32)
            * self.atom37_gt_exists[:, a37["CA"]].astype(np.float32)
            * self.atom37_gt_exists[:, a37["C"]].astype(np.float32)
        )
        feats.update(
            atom37_to_backbone_frames(
                np.argmax(self.aatype, axis=-1),
                self.atom37_positions,
                (self.atom37_gt_exists & self.atom37_atom_exists).astype(np.float32),
            )
        )
        return feats


def atom37_to_backbone_frames(
    aatype: np.ndarray, all_atom_positions: np.ndarray, all_atom_mask: np.ndarray
) -> Dict[str, np.ndarray]:
    """Backbone-only rigid group GT frames (groups: bb, pre-omega, phi, psi).

    Mirrors the reference's pruned atom37_to_frames (all_atom.py:137-268):
    only groups 0 (C, CA, N) and 3 (CA, C, O) are populated, and the backbone
    frame is mirrored to the legacy convention (x and z axes negated).
    """
    n = aatype.shape[0]
    base_idx = np.zeros((4, 3), dtype=np.int32)
    base_idx[0] = [constants.ATOM_ORDER["C"], constants.ATOM_ORDER["CA"], constants.ATOM_ORDER["N"]]
    base_idx[3] = [constants.ATOM_ORDER["CA"], constants.ATOM_ORDER["C"], constants.ATOM_ORDER["O"]]

    # float32 like the reference (its batched_gather_np casts to float32,
    # model/utils.py:45-53), so downstream frames match bit-for-bit.
    base_pos = all_atom_positions[:, base_idx].astype(np.float32)  # (N, 4, 3, 3)
    rot, trans = frames_np.rigids_from_3_points_np(
        base_pos[:, :, 0], base_pos[:, :, 1], base_pos[:, :, 2]
    )

    group_exists = np.zeros((n, 4), dtype=np.float32)
    group_exists[:, 0] = 1
    group_exists[:, 3] = 1
    atoms_exist = all_atom_mask[:, base_idx]  # (N, 4, 3)
    gt_exists = np.min(atoms_exist, axis=-1) * group_exists

    # Mirror the backbone group's x and z axes (legacy AF2 convention).
    mirror = np.tile(np.eye(3, dtype=np.float32), (4, 1, 1))
    mirror[0, 0, 0] = -1
    mirror[0, 2, 2] = -1
    rot = np.einsum("ngij,gjk->ngik", rot, mirror)

    flat12 = np.concatenate([rot.reshape(n, 4, 9), trans], axis=-1)
    return {
        "rigidgroups_gt_frames": flat12.astype(np.float32),
        "rigidgroups_gt_exists": gt_exists,
        "rigidgroups_group_exists": group_exists,
    }


# ---------------------------------------------------------------------------
# PDB parsing (fixed-column, no BioPython)
# ---------------------------------------------------------------------------


def parse_pdb_string(pdb_str: str, chain_id: Optional[str] = None) -> ProteinSample:
    """Parse a PDB file into a ProteinSample.

    Matches the reference parser's semantics (protein_structure_sample.py:
    166-248): non-standard residues become UNK, atoms outside the atom37
    vocabulary are ignored, residues with no recognized atoms are skipped,
    multi-model files and insertion codes are rejected.  Alternate locations
    keep the highest-occupancy conformer.
    """
    residues: Dict[tuple, dict] = {}
    order: List[tuple] = []
    num_models = 0
    in_model = False

    for line in io.StringIO(pdb_str):
        record = line[:6]
        if record == "MODEL ":
            num_models += 1
            if num_models > 1:
                raise ValueError(
                    f"Only single model PDBs are supported. Found {num_models} models."
                )
            in_model = True
        elif record == "ENDMDL":
            in_model = False
        elif record in ("ATOM  ", "HETATM"):
            if len(line.rstrip("\r\n")) < 54:
                raise ValueError(
                    f"truncated {record.strip()} record (needs the 54-column "
                    f"coordinate block): {line.rstrip()!r}"
                )
            atom_name = line[12:16].strip()
            altloc = line[16]
            resname = line[17:20].strip()
            chain = line[21]
            try:
                resseq = int(line[22:26])
            except ValueError:
                continue
            icode = line[26]
            if chain_id is not None and chain != chain_id:
                continue
            if icode != " ":
                raise ValueError(
                    f"PDB contains an insertion code at chain {chain} and residue "
                    f"index {resseq}. These are not supported."
                )
            hetfield = " " if record == "ATOM  " else ("W" if resname in ("HOH", "WAT") else "H")
            key = (chain, hetfield, resseq)
            if key not in residues:
                residues[key] = {"resname": resname, "atoms": {}}
                order.append(key)
            if atom_name not in constants.ATOM_ORDER:
                continue
            try:
                occupancy = float(line[54:60])
            except ValueError:
                occupancy = 1.0
            coord = np.array(
                [float(line[30:38]), float(line[38:46]), float(line[46:54])],
                dtype=np.float32,
            )
            atoms = residues[key]["atoms"]
            if atom_name in atoms and altloc != " ":
                if occupancy <= atoms[atom_name][1]:
                    continue
            atoms[atom_name] = (coord, occupancy)

    return _residues_to_sample(order, residues, chain_id)


def _residues_to_sample(
    order: List[tuple], residues: Dict[tuple, dict], chain_id: Optional[str]
) -> ProteinSample:
    """Shared tail of the PDB/mmCIF parsers: accumulated per-residue atom
    dicts -> ProteinSample (one-hot aatype, atom37 positions/masks)."""
    aatype: List[int] = []
    positions: List[np.ndarray] = []
    gt_exists: List[np.ndarray] = []
    atom_exists: List[np.ndarray] = []

    for key in order:
        res = residues[key]
        if not res["atoms"]:
            continue  # no recognized atom positions: skip residue
        shortname = constants.RESTYPE_3TO1.get(res["resname"], "X")
        res_name = constants.RESTYPE_1TO3.get(shortname, "UNK")
        restype_idx = constants.RESTYPE_ORDER.get(shortname, constants.RESTYPE_NUM)

        pos = np.zeros((37, 3), dtype=np.float64)
        mask = np.zeros((37,), dtype=np.float64)
        for name, (coord, _) in res["atoms"].items():
            pos[constants.ATOM_ORDER[name]] = coord
            mask[constants.ATOM_ORDER[name]] = 1.0
        aatype.append(restype_idx)
        positions.append(pos)
        gt_exists.append(mask)
        atom_exists.append(np.asarray(constants.RES_ATOM37_EXIST[res_name]))

    n = len(positions)
    one_hot = np.zeros((n, 21), dtype=np.float32)
    if n:
        one_hot[np.arange(n), np.asarray(aatype, dtype=np.int64)] = 1.0
    return ProteinSample(
        chain_id=chain_id,
        nb_residues=n,
        aatype=one_hot,
        # reshape keeps the (0, 37, ...) trailing dims for empty inputs
        atom37_positions=np.asarray(positions, np.float64).reshape(n, 37, 3),
        atom37_gt_exists=np.asarray(gt_exists).astype(bool).reshape(n, 37),
        atom37_atom_exists=np.asarray(atom_exists).astype(bool).reshape(n, 37),
    )


def _cif_tokens(line: str) -> List[str]:
    """Tokenize one mmCIF data line (handles '...'/"..." quoted values)."""
    tokens: List[str] = []
    i, n = 0, len(line)
    while i < n:
        c = line[i]
        if c in " \t":
            i += 1
        elif c in "'\"":
            j = i + 1
            # closing quote must be followed by whitespace/EOL per the spec
            while j < n and not (line[j] == c and (j + 1 == n or line[j + 1] in " \t")):
                j += 1
            tokens.append(line[i + 1 : j])
            i = j + 1
        else:
            j = i
            while j < n and line[j] not in " \t":
                j += 1
            tokens.append(line[i:j])
            i = j
    return tokens


def parse_cif_string(cif_str: str, chain_id: Optional[str] = None) -> ProteinSample:
    """Parse an mmCIF `_atom_site` loop into a ProteinSample.

    Format extension over the reference (its parser reads legacy PDB only,
    protein_structure_sample.py:166-248); semantics mirror
    :func:`parse_pdb_string` exactly: non-standard residues become UNK, atoms
    outside the atom37 vocabulary are ignored, residues with no recognized
    atoms are skipped, multi-model files and insertion codes are rejected,
    alternate locations keep the highest-occupancy conformer.  `auth_*`
    identifiers are preferred over `label_*` (they are what the equivalent
    PDB file records).
    """
    lines = iter(cif_str.splitlines())
    tags: List[str] = []
    rows: List[List[str]] = []
    in_loop_header = False
    in_atom_rows = False
    pending: List[str] = []

    for line in lines:
        stripped = line.strip()
        if in_atom_rows:
            if stripped.startswith(("_", "loop_", "#", "data_")) or not stripped:
                if pending:
                    raise ValueError("mmCIF _atom_site loop ended mid-row")
                break
            pending.extend(_cif_tokens(line))
            while len(pending) >= len(tags):
                rows.append(pending[: len(tags)])
                pending = pending[len(tags) :]
            continue
        if stripped == "loop_":
            in_loop_header = True
            tags = []
            continue
        if in_loop_header:
            if stripped.startswith("_atom_site."):
                tags.append(stripped.split()[0])
                continue
            if stripped.startswith("_"):  # a different loop's tags
                in_loop_header = False
                tags = []
                continue
            if tags:  # first data row of the atom_site loop
                in_atom_rows = True
                pending.extend(_cif_tokens(line))
                while len(pending) >= len(tags):
                    rows.append(pending[: len(tags)])
                    pending = pending[len(tags) :]
            else:
                in_loop_header = False

    if not tags or not rows:
        raise ValueError("no _atom_site loop found in mmCIF input")

    col = {t: i for i, t in enumerate(tags)}

    def field(row: List[str], *names: str, default: Optional[str] = None) -> str:
        for name in names:
            idx = col.get(f"_atom_site.{name}")
            if idx is not None:
                return row[idx]
        if default is None:
            raise ValueError(f"mmCIF _atom_site loop missing column(s) {names}")
        return default

    residues: Dict[tuple, dict] = {}
    order: List[tuple] = []
    model_seen: Optional[str] = None

    for row in rows:
        group = field(row, "group_PDB", default="ATOM")
        if group not in ("ATOM", "HETATM"):
            continue
        model = field(row, "pdbx_PDB_model_num", default="1")
        if model_seen is None:
            model_seen = model
        elif model != model_seen:
            raise ValueError("Only single model mmCIF files are supported.")
        chain = field(row, "auth_asym_id", "label_asym_id")
        if chain_id is not None and chain != chain_id:
            continue
        icode = field(row, "pdbx_PDB_ins_code", default=".")
        if icode not in (".", "?", ""):
            raise ValueError(
                f"mmCIF contains an insertion code at chain {chain}. "
                "These are not supported."
            )
        atom_name = field(row, "auth_atom_id", "label_atom_id")
        altloc = field(row, "label_alt_id", default=".")
        resname = field(row, "auth_comp_id", "label_comp_id")
        try:
            resseq = int(field(row, "auth_seq_id", "label_seq_id"))
        except ValueError:
            continue
        hetfield = " " if group == "ATOM" else ("W" if resname in ("HOH", "WAT") else "H")
        key = (chain, hetfield, resseq)
        if key not in residues:
            residues[key] = {"resname": resname, "atoms": {}}
            order.append(key)
        if atom_name not in constants.ATOM_ORDER:
            continue
        try:
            occupancy = float(field(row, "occupancy", default="1.0"))
        except ValueError:
            occupancy = 1.0
        coord = np.array(
            [
                float(field(row, "Cartn_x")),
                float(field(row, "Cartn_y")),
                float(field(row, "Cartn_z")),
            ],
            dtype=np.float32,
        )
        atoms = residues[key]["atoms"]
        if atom_name in atoms and altloc not in (".", "?", ""):
            if occupancy <= atoms[atom_name][1]:
                continue
        atoms[atom_name] = (coord, occupancy)

    return _residues_to_sample(order, residues, chain_id)


def parse_pdb_file(path: str, chain_id: Optional[str] = None) -> ProteinSample:
    with open(path) as f:
        return parse_pdb_string(f.read(), chain_id)


def parse_cif_file(path: str, chain_id: Optional[str] = None) -> ProteinSample:
    with open(path) as f:
        return parse_cif_string(f.read(), chain_id)


def parse_structure_file(path: str, chain_id: Optional[str] = None) -> ProteinSample:
    """Parse a structure file, dispatching on extension (.pdb vs .cif/.mmcif)."""
    if path.lower().endswith((".cif", ".mmcif")):
        return parse_cif_file(path, chain_id)
    return parse_pdb_file(path, chain_id)
