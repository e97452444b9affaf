"""Tokenize a directory of PDB files into structure-token .npy files.

Counterpart of /root/reference/scripts/tokenize_pdb.py:29-121 (same flags),
running on the jit/mesh path.

Usage:
  python -m protein_structure_tokenizer_tpu.cli.tokenize_pdb \
      --pdb_dir casp14_pdbs --token_save_path out/tokens \
      --codebook_size 4096 --model_downsampling 1 --weights weights/4k_df_1
"""
import argparse
import glob
import os

from protein_structure_tokenizer_tpu.cli.common import (
    add_model_args,
    build_runner,
    setup_logging,
)


def main(argv=None) -> None:
    setup_logging()
    parser = argparse.ArgumentParser(description="Tokenize PDB structures")
    parser.add_argument("--pdb_dir", type=str, required=True)
    parser.add_argument("--token_save_path", type=str, required=True)
    parser.add_argument("--num_featurize_workers", type=int, default=0)
    parser.add_argument(
        "--no_length_buckets",
        dest="length_buckets",
        action="store_false",
        help="Always pad to seq_max like the reference instead of per-batch "
        "length buckets (tokens are bit-identical either way).",
    )
    parser.add_argument(
        "--skip_invalid",
        action="store_true",
        help="Log and skip structures that fail featurization instead of "
        "failing the whole batch (the reference fail-fasts).",
    )
    add_model_args(parser)
    args = parser.parse_args(argv)

    pdbs = sorted(
        glob.glob(os.path.join(args.pdb_dir, "*.pdb"))
        + glob.glob(os.path.join(args.pdb_dir, "*.cif"))
        + glob.glob(os.path.join(args.pdb_dir, "*.mmcif"))
    )
    if not pdbs:
        raise FileNotFoundError(f"no .pdb files under {args.pdb_dir}")

    runner = build_runner(args)
    runner.num_featurize_workers = args.num_featurize_workers
    runner.tokenize(
        pdbs,
        args.token_save_path,
        batch_size_per_device=args.batch_size_per_device,
        progress=True,
        profile_dir=args.profile_dir,
        skip_invalid=args.skip_invalid,
    )


if __name__ == "__main__":
    main()
