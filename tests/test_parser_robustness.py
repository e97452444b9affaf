"""Parser robustness: hostile/malformed inputs must fail predictably.

The reference delegates parsing to BioPython and documents failure modes
instead of handling them (SURVEY.md §5.3); a production ingest path must
never crash with anything other than a clear ValueError (or return an empty
sample) on garbage.  Seeded structured fuzzing — no hypothesis dependency.
"""
import numpy as np
import pytest

from protein_structure_tokenizer_tpu.data.sample import (
    parse_cif_string,
    parse_pdb_string,
)

OK_ERRORS = (ValueError,)


def _parse_defensively(parser, text):
    """Parser contract: returns a ProteinSample or raises ValueError."""
    try:
        sample = parser(text)
    except OK_ERRORS:
        return None
    assert sample.nb_residues >= 0
    assert sample.atom37_positions.shape == (sample.nb_residues, 37, 3)
    assert np.isfinite(sample.atom37_positions[sample.atom37_gt_exists]).all()
    return sample


def test_empty_and_whitespace():
    for text in ("", "\n\n", "   \n\t\n"):
        s = _parse_defensively(parse_pdb_string, text)
        assert s is None or s.nb_residues == 0
        _parse_defensively(parse_cif_string, text)


def test_random_binary_garbage():
    rng = np.random.RandomState(0)
    for _ in range(25):
        blob = bytes(rng.randint(0, 256, size=rng.randint(1, 400), dtype=np.uint8))
        text = blob.decode("latin-1")
        s = _parse_defensively(parse_pdb_string, text)
        assert s is None or s.nb_residues == 0
        _parse_defensively(parse_cif_string, text)


def test_random_line_shuffles_of_real_records():
    """Truncations, duplications, and shuffles of valid ATOM records parse
    without crashing and never produce non-finite coordinates."""
    base = (
        "ATOM      1  N   ALA A   1       0.000   0.000   0.000  1.00  0.00           N\n"
        "ATOM      2  CA  ALA A   1       1.458   0.000   0.000  1.00  0.00           C\n"
        "ATOM      3  C   ALA A   1       2.000   1.400   0.000  1.00  0.00           C\n"
        "TER\nEND\n"
    )
    rng = np.random.RandomState(1)
    lines = base.splitlines()
    for _ in range(40):
        n = rng.randint(1, 8)
        picked = [lines[rng.randint(len(lines))] for _ in range(n)]
        # randomly truncate some lines mid-column
        mutated = [
            ln[: rng.randint(6, max(7, len(ln)))] if rng.rand() < 0.5 else ln
            for ln in picked
        ]
        _parse_defensively(parse_pdb_string, "\n".join(mutated))


def test_truncated_atom_lines_are_rejected_or_skipped():
    # coordinates sliced off -> float('') must surface as ValueError,
    # not IndexError/UnboundLocalError
    line = "ATOM      1  CA  ALA A   1       1.458"
    s = _parse_defensively(parse_pdb_string, line)
    assert s is None or s.nb_residues == 0


def test_nonnumeric_fields():
    bad_coord = (
        "ATOM      1  CA  ALA A   1       xxxxx   0.000   0.000  1.00  0.00           C"
    )
    _parse_defensively(parse_pdb_string, bad_coord)
    bad_occ = (
        "ATOM      1  CA  ALA A   1       1.000   0.000   0.000  ????  0.00           C"
    )
    s = _parse_defensively(parse_pdb_string, bad_occ)
    if s is not None and s.nb_residues:
        assert s.atom37_gt_exists[0, 1]  # CA kept, occupancy defaulted


def test_cif_header_only_variants():
    for text in (
        "data_x\n",
        "loop_\n",
        "loop_\n_atom_site.group_PDB\n",  # tags but no rows
        "loop_\n_other.a\nval\nloop_\n_atom_site.id\n",  # atom loop, no rows
    ):
        with pytest.raises(ValueError):
            parse_cif_string(text)


def test_cif_row_column_count_mismatch():
    cif = "\n".join(
        [
            "loop_",
            "_atom_site.group_PDB",
            "_atom_site.auth_atom_id",
            "_atom_site.auth_comp_id",
            "_atom_site.auth_asym_id",
            "_atom_site.auth_seq_id",
            "_atom_site.Cartn_x",
            "_atom_site.Cartn_y",
            "_atom_site.Cartn_z",
            "ATOM CA ALA A 1 1.0 2.0",  # one value short, loop ends
            "#",
        ]
    )
    with pytest.raises(ValueError):
        parse_cif_string(cif)


def test_cif_fuzzed_atom_rows():
    rng = np.random.RandomState(2)
    tags = [
        "_atom_site.group_PDB", "_atom_site.auth_atom_id",
        "_atom_site.auth_comp_id", "_atom_site.auth_asym_id",
        "_atom_site.auth_seq_id", "_atom_site.Cartn_x",
        "_atom_site.Cartn_y", "_atom_site.Cartn_z",
    ]
    vocab = ["ATOM", "HETATM", "CA", "N", "ALA", "A", "1", "2", "x", "1.0",
             "-3.5", "?", ".", "'q u o t e d'", "9" * 40]
    for _ in range(40):
        rows = [
            " ".join(vocab[rng.randint(len(vocab))] for _ in range(len(tags)))
            for _ in range(rng.randint(1, 5))
        ]
        text = "\n".join(["loop_"] + tags + rows + ["#"])
        _parse_defensively(parse_cif_string, text)
