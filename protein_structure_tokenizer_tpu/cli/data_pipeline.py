"""Standalone preprocessing CLI (counterpart of /root/reference/data_pipeline.py:366-505).

Usage:
  python -m protein_structure_tokenizer_tpu.cli.data_pipeline \
      --input structure.pdb --output out.npz [--chain A] [--info_only]
  python -m protein_structure_tokenizer_tpu.cli.data_pipeline \
      --input_dir pdbs/ --output_dir processed/
"""
import argparse
import json

from protein_structure_tokenizer_tpu.cli.common import setup_logging
from protein_structure_tokenizer_tpu.data.featurize import FeaturizeConfig
from protein_structure_tokenizer_tpu.data.pipeline import DataPipeline, PipelineConfig


def main(argv=None) -> None:
    setup_logging()
    parser = argparse.ArgumentParser(description="Protein preprocessing pipeline")
    parser.add_argument("--input", type=str, help="single PDB file")
    parser.add_argument("--output", type=str, help="output .npz for --input")
    parser.add_argument("--input_dir", type=str, help="directory of PDB files")
    parser.add_argument("--output_dir", type=str, help="directory for batch outputs")
    parser.add_argument("--chain", type=str, default=None)
    parser.add_argument("--info_only", action="store_true")
    parser.add_argument("--num_neighbor", type=int, default=50)
    parser.add_argument("--downsampling_ratio", type=int, default=1)
    parser.add_argument("--padding_num_residue", type=int, default=512)
    parser.add_argument("--min_valid_residues", type=int, default=50)
    args = parser.parse_args(argv)

    pipeline = DataPipeline(
        PipelineConfig(
            featurize=FeaturizeConfig(
                num_neighbor=args.num_neighbor,
                downsampling_ratio=args.downsampling_ratio,
                padding_num_residue=args.padding_num_residue,
                crop_index=args.padding_num_residue,
            ),
            min_number_valid_residues=args.min_valid_residues,
            max_number_residues=args.padding_num_residue,
        )
    )

    if args.info_only:
        if not args.input:
            parser.error("--info_only requires --input")
        sample = pipeline.load_from_pdb_file(args.input, args.chain)
        print(json.dumps(pipeline.info(sample), indent=2))
        return

    if args.input:
        pipeline.process_single(args.input, args.output, args.chain)
        print(f"wrote {args.output}")
    elif args.input_dir:
        import glob
        import os

        paths = sorted(glob.glob(os.path.join(args.input_dir, "*.pdb")))
        results = pipeline.process_batch(paths, args.output_dir, args.chain)
        ok = sum(1 for v in results.values() if v)
        print(f"processed {ok}/{len(results)} structures into {args.output_dir}")
    else:
        parser.error("provide --input or --input_dir")


if __name__ == "__main__":
    main()
