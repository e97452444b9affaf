"""Write fixed-length PDB crops for trained-weights evaluation.

A tokenizer trained at seq_max=C sees random C-residue crops of each chain
(data/featurize.py:173-183); for a DETERMINISTIC reconstruction eval, the
target files themselves must be the crops.  This writes <stem>.pdb files
containing residues [start, start+C) of each input chain (chains shorter
than C pass through whole).

Usage: python tools/crop_pdbs.py --pdb_dir <in> --out <dir> --crop 96
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pdb_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--crop", type=int, default=96)
    p.add_argument("--start", type=int, default=0)
    args = p.parse_args(argv)

    from protein_structure_tokenizer_tpu.data.protein_io import Protein, save_pdb
    from protein_structure_tokenizer_tpu.data.sample import parse_pdb_file

    os.makedirs(args.out, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(args.pdb_dir, "*.pdb"))):
        s = parse_pdb_file(path)
        sl = slice(args.start, args.start + args.crop)
        prot = Protein.from_atom37_rep(
            s.atom37_positions[sl].astype(np.float64),
            s.atom37_gt_exists[sl],
            s.atom37_atom_exists[sl],
            s.aatype[sl],
        )
        stem = os.path.splitext(os.path.basename(path))[0]
        save_pdb(prot, os.path.join(args.out, f"{stem}.pdb"))
        print(stem, int(min(s.nb_residues, args.crop)))


if __name__ == "__main__":
    main()
