"""Residue/atom constant tables (AF2 conventions).

These are standard biochemical facts in the AlphaFold2 encoding (atom37 /
atom14 layouts, one-letter residue order, idealized backbone geometry).  The
numeric values must match the reference's tables exactly for token/structure
parity (/root/reference/structure_tokenizer/data/residue_constants.py); a unit
test cross-checks every derived array against the reference at test time.

The decode path's rigid-group constants are *backbone-only and built from
GLU's idealized geometry* — a deliberate quirk of the reference
(residue_constants.py:1069-1140): all residues are decoded with the same four
backbone rigid groups (backbone, pre-omega, phi, psi).
"""
from __future__ import annotations

import functools
from typing import Dict, List

import numpy as np

# The 37 heavy-atom slots, in canonical AF2 order.
ATOM_TYPES: List[str] = [
    "N", "CA", "C", "CB", "O", "CG", "CG1", "CG2", "OG", "OG1", "SG", "CD",
    "CD1", "CD2", "ND1", "ND2", "OD1", "OD2", "SD", "CE", "CE1", "CE2", "CE3",
    "NE", "NE1", "NE2", "OE1", "OE2", "CH2", "NH1", "NH2", "OH", "CZ", "CZ2",
    "CZ3", "NZ", "OXT",
]
ATOM_ORDER: Dict[str, int] = {name: i for i, name in enumerate(ATOM_TYPES)}
ATOM_TYPE_NUM = len(ATOM_TYPES)  # 37

BACKBONE_ATOM_TYPES = ["N", "CA", "C", "O"]
N_INDEX = ATOM_ORDER["N"]
CA_INDEX = ATOM_ORDER["CA"]
C_INDEX = ATOM_ORDER["C"]
CB_INDEX = ATOM_ORDER["CB"]
O_INDEX = ATOM_ORDER["O"]

# One-letter residue codes in the standard order (3-letter codes sorted).
RESTYPES: List[str] = [
    "A", "R", "N", "D", "C", "Q", "E", "G", "H", "I",
    "L", "K", "M", "F", "P", "S", "T", "W", "Y", "V",
]
RESTYPE_ORDER: Dict[str, int] = {r: i for i, r in enumerate(RESTYPES)}
RESTYPE_NUM = len(RESTYPES)  # 20
UNK_RESTYPE_INDEX = RESTYPE_NUM
RESTYPES_WITH_X: List[str] = RESTYPES + ["X"]

RESTYPE_1TO3: Dict[str, str] = {
    "A": "ALA", "R": "ARG", "N": "ASN", "D": "ASP", "C": "CYS", "Q": "GLN",
    "E": "GLU", "G": "GLY", "H": "HIS", "I": "ILE", "L": "LEU", "K": "LYS",
    "M": "MET", "F": "PHE", "P": "PRO", "S": "SER", "T": "THR", "W": "TRP",
    "Y": "TYR", "V": "VAL",
}
RESTYPE_3TO1: Dict[str, str] = {v: k for k, v in RESTYPE_1TO3.items()}

# Heavy atoms present in each residue type.
RESIDUE_ATOMS: Dict[str, List[str]] = {
    "ALA": ["C", "CA", "CB", "N", "O"],
    "ARG": ["C", "CA", "CB", "CG", "CD", "CZ", "N", "NE", "O", "NH1", "NH2"],
    "ASP": ["C", "CA", "CB", "CG", "N", "O", "OD1", "OD2"],
    "ASN": ["C", "CA", "CB", "CG", "N", "ND2", "O", "OD1"],
    "CYS": ["C", "CA", "CB", "N", "O", "SG"],
    "GLU": ["C", "CA", "CB", "CG", "CD", "N", "O", "OE1", "OE2"],
    "GLN": ["C", "CA", "CB", "CG", "CD", "N", "NE2", "O", "OE1"],
    "GLY": ["C", "CA", "N", "O"],
    "HIS": ["C", "CA", "CB", "CG", "CD2", "CE1", "N", "ND1", "NE2", "O"],
    "ILE": ["C", "CA", "CB", "CG1", "CG2", "CD1", "N", "O"],
    "LEU": ["C", "CA", "CB", "CG", "CD1", "CD2", "N", "O"],
    "LYS": ["C", "CA", "CB", "CG", "CD", "CE", "N", "NZ", "O"],
    "MET": ["C", "CA", "CB", "CG", "CE", "N", "O", "SD"],
    "PHE": ["C", "CA", "CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ", "N", "O"],
    "PRO": ["C", "CA", "CB", "CG", "CD", "N", "O"],
    "SER": ["C", "CA", "CB", "N", "O", "OG"],
    "THR": ["C", "CA", "CB", "CG2", "N", "O", "OG1"],
    "TRP": [
        "C", "CA", "CB", "CG", "CD1", "CD2", "CE2", "CE3", "CZ2", "CZ3",
        "CH2", "N", "NE1", "O",
    ],
    "TYR": ["C", "CA", "CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ", "N", "O", "OH"],
    "VAL": ["C", "CA", "CB", "CG1", "CG2", "N", "O"],
}

# Compact per-residue 14-slot atom layout.
RESTYPE_NAME_TO_ATOM14_NAMES: Dict[str, List[str]] = {
    "ALA": ["N", "CA", "C", "O", "CB", "", "", "", "", "", "", "", "", ""],
    "ARG": ["N", "CA", "C", "O", "CB", "CG", "CD", "NE", "CZ", "NH1", "NH2", "", "", ""],
    "ASN": ["N", "CA", "C", "O", "CB", "CG", "OD1", "ND2", "", "", "", "", "", ""],
    "ASP": ["N", "CA", "C", "O", "CB", "CG", "OD1", "OD2", "", "", "", "", "", ""],
    "CYS": ["N", "CA", "C", "O", "CB", "SG", "", "", "", "", "", "", "", ""],
    "GLN": ["N", "CA", "C", "O", "CB", "CG", "CD", "OE1", "NE2", "", "", "", "", ""],
    "GLU": ["N", "CA", "C", "O", "CB", "CG", "CD", "OE1", "OE2", "", "", "", "", ""],
    "GLY": ["N", "CA", "C", "O", "", "", "", "", "", "", "", "", "", ""],
    "HIS": ["N", "CA", "C", "O", "CB", "CG", "ND1", "CD2", "CE1", "NE2", "", "", "", ""],
    "ILE": ["N", "CA", "C", "O", "CB", "CG1", "CG2", "CD1", "", "", "", "", "", ""],
    "LEU": ["N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "", "", "", "", "", ""],
    "LYS": ["N", "CA", "C", "O", "CB", "CG", "CD", "CE", "NZ", "", "", "", "", ""],
    "MET": ["N", "CA", "C", "O", "CB", "CG", "SD", "CE", "", "", "", "", "", ""],
    "PHE": ["N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ", "", "", ""],
    "PRO": ["N", "CA", "C", "O", "CB", "CG", "CD", "", "", "", "", "", "", ""],
    "SER": ["N", "CA", "C", "O", "CB", "OG", "", "", "", "", "", "", "", ""],
    "THR": ["N", "CA", "C", "O", "CB", "OG1", "CG2", "", "", "", "", "", "", ""],
    "TRP": [
        "N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "NE1", "CE2", "CE3",
        "CZ2", "CZ3", "CH2",
    ],
    "TYR": [
        "N", "CA", "C", "O", "CB", "CG", "CD1", "CD2", "CE1", "CE2", "CZ",
        "OH", "", "",
    ],
    "VAL": ["N", "CA", "C", "O", "CB", "CG1", "CG2", "", "", "", "", "", "", ""],
    "UNK": ["", "", "", "", "", "", "", "", "", "", "", "", "", ""],
}

# atom37 existence vector per residue name (+UNK backbone-only).
RES_ATOM37_EXIST: Dict[str, List[float]] = {
    residue: [float(a in atoms) for a in ATOM_TYPES]
    for residue, atoms in RESIDUE_ATOMS.items()
}
RES_ATOM37_EXIST["UNK"] = [1.0, 1.0, 1.0, 1.0] + [0.0] * 33

# Idealized backbone geometry taken from GLU's rigid-group literature
# positions — the reference decodes *every* residue with these four backbone
# groups (0 = backbone frame, 1 = pre-omega, 2 = phi, 3 = psi).
GLU_BACKBONE_RIGID_GROUP: Dict[str, tuple] = {
    # atom: (group_idx, (x, y, z))
    "N": (0, (-0.528, 1.361, 0.000)),
    "CA": (0, (0.000, 0.000, 0.000)),
    "C": (0, (1.526, -0.000, -0.000)),
    "O": (3, (0.626, 1.062, 0.000)),
}


def _rigid_transformation_4x4(ex: np.ndarray, ey: np.ndarray, translation: np.ndarray) -> np.ndarray:
    ex = ex / np.linalg.norm(ex)
    ey = ey - np.dot(ey, ex) * ex
    ey /= np.linalg.norm(ey)
    ez = np.cross(ex, ey)
    m = np.stack([ex, ey, ez, translation]).transpose()
    return np.concatenate([m, [[0.0, 0.0, 0.0, 1.0]]], axis=0)


@functools.lru_cache(maxsize=1)
def backbone_rigid_group_constants():
    """Backbone-only rigid group tables (shapes match the reference's).

    Returns dict with:
      atom14_to_rigid_group  (1, 14) int32
      atom14_mask            (1, 14) float32
      atom14_rigid_group_positions (1, 14, 3) float32
      rigid_group_default_frame    (1, 4, 4, 4) float32
    """
    atom14_to_group = np.zeros([1, 14], dtype=np.int32)
    atom14_mask = np.zeros([1, 14], dtype=np.float32)
    atom14_positions = np.zeros([1, 14, 3], dtype=np.float32)
    default_frame = np.zeros([1, 4, 4, 4], dtype=np.float32)

    glu14 = RESTYPE_NAME_TO_ATOM14_NAMES["GLU"]
    for atom, (group_idx, pos) in GLU_BACKBONE_RIGID_GROUP.items():
        idx14 = glu14.index(atom)
        atom14_to_group[0, idx14] = group_idx
        atom14_mask[0, idx14] = 1.0
        atom14_positions[0, idx14] = pos

    pos = {name: np.array(p, dtype=np.float64) for name, (_, p) in GLU_BACKBONE_RIGID_GROUP.items()}
    default_frame[0, 0] = np.eye(4)
    default_frame[0, 1] = np.eye(4)  # pre-omega: identity placeholder
    default_frame[0, 2] = _rigid_transformation_4x4(
        ex=pos["N"] - pos["CA"], ey=np.array([1.0, 0.0, 0.0]), translation=pos["N"]
    )
    default_frame[0, 3] = _rigid_transformation_4x4(
        ex=pos["C"] - pos["CA"], ey=pos["CA"] - pos["N"], translation=pos["C"]
    )
    return {
        "atom14_to_rigid_group": atom14_to_group,
        "atom14_mask": atom14_mask,
        "atom14_rigid_group_positions": atom14_positions,
        "rigid_group_default_frame": default_frame,
    }


@functools.lru_cache(maxsize=1)
def restype_atom37_mask() -> np.ndarray:
    """(21, 37) which atom37 slots exist per residue type (UNK row zero)."""
    mask = np.zeros([21, 37], dtype=np.float32)
    for restype, letter in enumerate(RESTYPES):
        for atom_name in RESIDUE_ATOMS[RESTYPE_1TO3[letter]]:
            mask[restype, ATOM_ORDER[atom_name]] = 1
    return mask


@functools.lru_cache(maxsize=1)
def restype_atom37_to_atom14() -> np.ndarray:
    """(21, 37) index of each atom37 slot within the residue's atom14 layout."""
    out = []
    for letter in RESTYPES:
        names14 = RESTYPE_NAME_TO_ATOM14_NAMES[RESTYPE_1TO3[letter]]
        name_to_idx = {name: i for i, name in enumerate(names14) if name}
        out.append([name_to_idx.get(name, 0) for name in ATOM_TYPES])
    out.append([0] * 37)
    return np.array(out, dtype=np.int32)


# Standard (full-chain) rigid-group frame tables are intentionally absent: the
# released decoder only ever reconstructs backbones (SURVEY.md §2.4), so the
# backbone-only tables above are the complete surface needed for parity.


# ---------------------------------------------------------------------------
# Stereochemistry tables for torsion extraction and violation metrics
# (Engh & Huber values as tabulated by AlphaFold-2; cf. the reference's
# residue_constants.py:29,34-139,407-413,520-534).
# ---------------------------------------------------------------------------

# Idealized consecutive CA-CA distance (Angstrom).
CA_CA_DISTANCE = 3.80209737096

# Between-residue C-N peptide-bond length (general, to-proline) and stddevs.
BETWEEN_RES_BOND_LENGTH_C_N = (1.329, 1.341)
BETWEEN_RES_BOND_LENGTH_STDDEV_C_N = (0.014, 0.016)

# Between-residue bond-angle cosines (mean, stddev).
BETWEEN_RES_COS_ANGLES_C_N_CA = (-0.5203, 0.0353)  # 121.352 +- 2.315 deg
BETWEEN_RES_COS_ANGLES_CA_C_N = (-0.4473, 0.0311)  # 116.568 +- 1.995 deg

# Van der Waals radii (Angstrom) keyed by element = first letter of atom name.
VAN_DER_WAALS_RADIUS: Dict[str, float] = {"C": 1.7, "N": 1.55, "O": 1.52, "S": 1.8}

# The four atoms defining each sidechain chi dihedral, per residue
# (chi5 of ARG is essentially constant and ignored, as in AF2).
CHI_ANGLES_ATOMS: Dict[str, List[List[str]]] = {
    "ALA": [],
    "ARG": [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD"],
            ["CB", "CG", "CD", "NE"], ["CG", "CD", "NE", "CZ"]],
    "ASN": [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "OD1"]],
    "ASP": [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "OD1"]],
    "CYS": [["N", "CA", "CB", "SG"]],
    "GLN": [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD"],
            ["CB", "CG", "CD", "OE1"]],
    "GLU": [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD"],
            ["CB", "CG", "CD", "OE1"]],
    "GLY": [],
    "HIS": [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "ND1"]],
    "ILE": [["N", "CA", "CB", "CG1"], ["CA", "CB", "CG1", "CD1"]],
    "LEU": [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD1"]],
    "LYS": [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD"],
            ["CB", "CG", "CD", "CE"], ["CG", "CD", "CE", "NZ"]],
    "MET": [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "SD"],
            ["CB", "CG", "SD", "CE"]],
    "PHE": [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD1"]],
    "PRO": [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD"]],
    "SER": [["N", "CA", "CB", "OG"]],
    "THR": [["N", "CA", "CB", "OG1"]],
    "TRP": [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD1"]],
    "TYR": [["N", "CA", "CB", "CG"], ["CA", "CB", "CG", "CD1"]],
    "VAL": [["N", "CA", "CB", "CG1"]],
}

# Chi angles that are pi-periodic (sidechain symmetric under a pi rotation),
# keyed by residue name -> 1-based chi index.
_PI_PERIODIC_CHI: Dict[str, int] = {"ASP": 2, "GLU": 3, "PHE": 2, "TYR": 2}

# Symmetric sidechain atoms whose names are ambiguous (lDDT paper table,
# reduced to the 4 residues where geometry cannot disambiguate).
RESIDUE_ATOM_RENAMING_SWAPS: Dict[str, Dict[str, str]] = {
    "ASP": {"OD1": "OD2"},
    "GLU": {"OE1": "OE2"},
    "PHE": {"CD1": "CD2", "CE1": "CE2"},
    "TYR": {"CD1": "CD2", "CE1": "CE2"},
}


@functools.lru_cache(maxsize=1)
def chi_angles_mask() -> np.ndarray:
    """(21, 4) which chi angles exist per restype (UNK row zero)."""
    mask = np.zeros([21, 4], dtype=np.float32)
    for restype, letter in enumerate(RESTYPES):
        mask[restype, : len(CHI_ANGLES_ATOMS[RESTYPE_1TO3[letter]])] = 1.0
    return mask


@functools.lru_cache(maxsize=1)
def chi_pi_periodic() -> np.ndarray:
    """(21, 4) flags for chi angles that are pi-periodic."""
    flags = np.zeros([21, 4], dtype=np.float32)
    for restype, letter in enumerate(RESTYPES):
        chi = _PI_PERIODIC_CHI.get(RESTYPE_1TO3[letter])
        if chi is not None:
            flags[restype, chi - 1] = 1.0
    return flags


@functools.lru_cache(maxsize=1)
def chi_atom37_indices() -> np.ndarray:
    """(21, 4, 4) atom37 indices of the 4 atoms defining each chi (0-padded)."""
    table = np.zeros([21, 4, 4], dtype=np.int32)
    for restype, letter in enumerate(RESTYPES):
        for chi, atoms in enumerate(CHI_ANGLES_ATOMS[RESTYPE_1TO3[letter]]):
            table[restype, chi] = [ATOM_ORDER[a] for a in atoms]
    return table


@functools.lru_cache(maxsize=1)
def atom14_van_der_waals_radius() -> np.ndarray:
    """(21, 14) per-slot Van der Waals radius (0 for absent slots)."""
    radius = np.zeros([21, 14], dtype=np.float32)
    for restype, letter in enumerate(RESTYPES):
        names = RESTYPE_NAME_TO_ATOM14_NAMES[RESTYPE_1TO3[letter]]
        radius[restype] = [VAN_DER_WAALS_RADIUS[n[0]] if n else 0.0 for n in names]
    return radius


@functools.lru_cache(maxsize=1)
def atom14_renaming_tables():
    """Ambiguous-atom swap tables in the atom14 layout.

    Returns (perm, ambiguous): perm (21, 14) int32 maps each slot to its
    name-swapped partner (identity where unambiguous); ambiguous (21, 14)
    float32 flags the swapped slots.
    """
    perm = np.tile(np.arange(14, dtype=np.int32), [21, 1])
    ambiguous = np.zeros([21, 14], dtype=np.float32)
    for resname, swaps in RESIDUE_ATOM_RENAMING_SWAPS.items():
        restype = RESTYPE_ORDER[RESTYPE_3TO1[resname]]
        names = RESTYPE_NAME_TO_ATOM14_NAMES[resname]
        for a, b in swaps.items():
            ia, ib = names.index(a), names.index(b)
            perm[restype, ia], perm[restype, ib] = ib, ia
            ambiguous[restype, ia] = ambiguous[restype, ib] = 1.0
    return perm, ambiguous


@functools.lru_cache(maxsize=1)
def atom14_mask() -> np.ndarray:
    """(21, 14) which atom14 slots exist per residue type (UNK row zero)."""
    mask = np.zeros([21, 14], dtype=np.float32)
    for restype, letter in enumerate(RESTYPES):
        names = RESTYPE_NAME_TO_ATOM14_NAMES[RESTYPE_1TO3[letter]]
        mask[restype] = [1.0 if n else 0.0 for n in names]
    return mask
