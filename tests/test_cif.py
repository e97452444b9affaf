"""mmCIF parser: equivalence with the PDB parser plus format quirks.

The reference reads legacy PDB only (protein_structure_sample.py:166-248);
our `parse_cif_string` is a format extension with identical residue/atom
semantics, pinned here by converting real CASP14 PDB records to an
`_atom_site` loop and asserting field-for-field sample equality.
"""
import glob
import os

import numpy as np
import pytest

from protein_structure_tokenizer_tpu.data.sample import (
    parse_cif_string,
    parse_pdb_string,
    parse_structure_file,
)

CASP14 = sorted(glob.glob("/root/reference/casp14_pdbs/*.pdb"))


def pdb_to_cif(pdb_str: str) -> str:
    """Minimal PDB -> mmCIF atom_site conversion (auth_* identifiers)."""
    header = [
        "data_converted",
        "#",
        "loop_",
        "_atom_site.group_PDB",
        "_atom_site.id",
        "_atom_site.auth_atom_id",
        "_atom_site.label_alt_id",
        "_atom_site.auth_comp_id",
        "_atom_site.auth_asym_id",
        "_atom_site.auth_seq_id",
        "_atom_site.pdbx_PDB_ins_code",
        "_atom_site.Cartn_x",
        "_atom_site.Cartn_y",
        "_atom_site.Cartn_z",
        "_atom_site.occupancy",
        "_atom_site.pdbx_PDB_model_num",
    ]
    rows = []
    serial = 0
    for line in pdb_str.splitlines():
        if line[:6] not in ("ATOM  ", "HETATM"):
            continue
        serial += 1
        atom = line[12:16].strip()
        altloc = line[16].strip() or "."
        resname = line[17:20].strip()
        chain = line[21].strip() or "."  # mmCIF writes '.' for a blank chain
        resseq = line[22:26].strip()
        icode = line[26].strip() or "."
        x, y, z = line[30:38].strip(), line[38:46].strip(), line[46:54].strip()
        occ = line[54:60].strip() or "1.00"
        group = "ATOM" if line[:6] == "ATOM  " else "HETATM"
        # quote atom names with primes the way real mmCIF files do
        atom_tok = f'"{atom}"' if "'" in atom else atom
        rows.append(
            f"{group} {serial} {atom_tok} {altloc} {resname} {chain} "
            f"{resseq} {icode} {x} {y} {z} {occ} 1"
        )
    return "\n".join(header + rows + ["#"])


def assert_samples_equal(a, b):
    assert a.nb_residues == b.nb_residues
    np.testing.assert_array_equal(a.aatype, b.aatype)
    np.testing.assert_array_equal(a.atom37_positions, b.atom37_positions)
    np.testing.assert_array_equal(a.atom37_gt_exists, b.atom37_gt_exists)
    np.testing.assert_array_equal(a.atom37_atom_exists, b.atom37_atom_exists)


@pytest.mark.skipif(not CASP14, reason="corpus not mounted")
@pytest.mark.parametrize("path", CASP14[:3], ids=os.path.basename)
def test_cif_matches_pdb_on_casp14(path):
    with open(path) as f:
        pdb_str = f.read()
    pdb_sample = parse_pdb_string(pdb_str)
    cif_sample = parse_cif_string(pdb_to_cif(pdb_str))
    assert_samples_equal(pdb_sample, cif_sample)


SMALL_PDB = (
    "ATOM      1  N   ALA A   1       0.000   0.000   0.000  1.00  0.00           N\n"
    "ATOM      2  CA  ALA A   1       1.458   0.000   0.000  1.00  0.00           C\n"
    "ATOM      3  C   ALA A   1       2.000   1.400   0.000  1.00  0.00           C\n"
    "ATOM      4  O   ALA A   1       1.600   2.500   0.200  1.00  0.00           O\n"
    "ATOM      5  N   GLY B   2       3.800   0.000   0.000  1.00  0.00           N\n"
    "ATOM      6  CA  GLY B   2       5.258   0.000   0.000  1.00  0.00           C\n"
)


def test_chain_filter_matches_pdb():
    cif = pdb_to_cif(SMALL_PDB)
    for chain in (None, "A", "B"):
        assert_samples_equal(
            parse_pdb_string(SMALL_PDB, chain), parse_cif_string(cif, chain)
        )
    assert parse_cif_string(cif, "A").nb_residues == 1


def test_altloc_keeps_highest_occupancy():
    cif = "\n".join(
        [
            "loop_",
            "_atom_site.group_PDB",
            "_atom_site.auth_atom_id",
            "_atom_site.label_alt_id",
            "_atom_site.auth_comp_id",
            "_atom_site.auth_asym_id",
            "_atom_site.auth_seq_id",
            "_atom_site.Cartn_x",
            "_atom_site.Cartn_y",
            "_atom_site.Cartn_z",
            "_atom_site.occupancy",
            "ATOM CA A ALA A 1 1.0 0.0 0.0 0.30",
            "ATOM CA B ALA A 1 9.0 0.0 0.0 0.70",
        ]
    )
    sample = parse_cif_string(cif)
    ca = sample.atom37_positions[0, 1]  # CA index is 1
    assert ca[0] == pytest.approx(9.0)


def test_rejections_and_fallbacks():
    with pytest.raises(ValueError, match="no _atom_site"):
        parse_cif_string("data_x\nloop_\n_other.tag\nval\n")

    # a 2-model cif: duplicate the last row with model number 2
    base = pdb_to_cif(SMALL_PDB)
    lines = base.splitlines()
    row = lines[-2]
    assert row.endswith(" 1")
    lines.insert(-1, row[:-2] + " 2")
    with pytest.raises(ValueError, match="single model"):
        parse_cif_string("\n".join(lines))

    ins_lines = base.splitlines()
    # set the ins_code column (8th value) of the first row to 'A'
    first_row = ins_lines[-7].split()
    first_row[7] = "A"
    ins_lines[-7] = " ".join(first_row)
    with pytest.raises(ValueError, match="insertion code"):
        parse_cif_string("\n".join(ins_lines))

    # label_* fallback when auth_* columns are absent
    fallback = base.replace("auth_atom_id", "label_atom_id").replace(
        "auth_comp_id", "label_comp_id"
    )
    assert_samples_equal(parse_pdb_string(SMALL_PDB), parse_cif_string(fallback))


def test_parse_structure_file_dispatch(tmp_path):
    pdb_path = tmp_path / "x.pdb"
    cif_path = tmp_path / "x.cif"
    pdb_path.write_text(SMALL_PDB)
    cif_path.write_text(pdb_to_cif(SMALL_PDB))
    assert_samples_equal(
        parse_structure_file(str(pdb_path)), parse_structure_file(str(cif_path))
    )
