"""Decode structure-token .npy files back into backbone PDB structures.

Counterpart of /root/reference/scripts/decode_tokens.py:29-127.

Usage:
  python -m protein_structure_tokenizer_tpu.cli.decode_tokens \
      --tokens_dir out/tokens --structure_save_path out \
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
    parser = argparse.ArgumentParser(description="Decode structure tokens to PDBs")
    parser.add_argument("--tokens_dir", type=str, required=True)
    parser.add_argument("--structure_save_path", type=str, required=True)
    parser.add_argument(
        "--pad_token_id",
        type=int,
        default=None,
        help="Mask-building pad id; defaults to the released configs' 4097.",
    )
    parser.add_argument(
        "--no_length_buckets",
        dest="length_buckets",
        action="store_false",
        help="Always pad to seq_max like the reference instead of per-batch "
        "length buckets (coordinates may differ ~1e-4 relative between the "
        "two due to reduction order; tokens paths are bit-identical).",
    )
    add_model_args(parser)
    args = parser.parse_args(argv)

    token_files = sorted(glob.glob(os.path.join(args.tokens_dir, "*.npy")))
    if not token_files:
        raise FileNotFoundError(f"no .npy token files under {args.tokens_dir}")

    runner = build_runner(args)
    runner.decode_tokens(
        token_files,
        args.structure_save_path,
        batch_size_per_device=args.batch_size_per_device,
        pad_token_id=args.pad_token_id,
        progress=True,
        profile_dir=args.profile_dir,
    )


if __name__ == "__main__":
    main()
