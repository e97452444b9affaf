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
    parser.add_argument("--num_neighbor", type=int, default=None)
    parser.add_argument("--downsampling_ratio", type=int, default=None)
    parser.add_argument("--padding_num_residue", type=int, default=None)
    parser.add_argument("--min_valid_residues", type=int, default=None)
    parser.add_argument(
        "--config", type=str, default=None,
        help="YAML with pipeline settings (flat keys and/or a `featurize:` "
        "section); explicit flags override it — the reference CLI's "
        "config-file mode (data_pipeline.py:360-363,440-455)",
    )
    args = parser.parse_args(argv)

    # defaults <- config file <- explicit flags (later wins).
    featurize_kw = {}
    pipeline_kw = {}
    if args.config:
        import dataclasses

        import yaml

        with open(args.config) as f:
            loaded = yaml.safe_load(f) or {}
        feat_fields = {f.name for f in dataclasses.fields(FeaturizeConfig)}
        pipe_fields = {f.name for f in dataclasses.fields(PipelineConfig)} - {"featurize"}
        featurize_kw.update(loaded.pop("featurize", None) or {})
        for key, value in loaded.items():
            if key in feat_fields:
                featurize_kw[key] = value
            elif key in pipe_fields:
                pipeline_kw[key] = value
            else:
                parser.error(f"unknown config key {key!r}")
        bad = set(featurize_kw) - feat_fields
        if bad:
            parser.error(f"unknown featurize config keys {sorted(bad)}")
        # A config that raises the padding must raise the crop ceiling with it
        # (the flag path does the same); otherwise long chains get silently
        # random-cropped to the 512 default.
        if "padding_num_residue" in featurize_kw:
            featurize_kw.setdefault("crop_index", featurize_kw["padding_num_residue"])
    if args.num_neighbor is not None:
        featurize_kw["num_neighbor"] = args.num_neighbor
    if args.downsampling_ratio is not None:
        featurize_kw["downsampling_ratio"] = args.downsampling_ratio
    if args.padding_num_residue is not None:
        featurize_kw["padding_num_residue"] = args.padding_num_residue
        featurize_kw["crop_index"] = args.padding_num_residue
    if args.min_valid_residues is not None:
        pipeline_kw["min_number_valid_residues"] = args.min_valid_residues
    pipeline_kw.setdefault(
        "max_number_residues",
        featurize_kw.get("padding_num_residue", FeaturizeConfig().padding_num_residue),
    )

    pipeline = DataPipeline(
        PipelineConfig(featurize=FeaturizeConfig(**featurize_kw), **pipeline_kw)
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

        paths = sorted(
            glob.glob(os.path.join(args.input_dir, "*.pdb"))
            + glob.glob(os.path.join(args.input_dir, "*.cif"))
            + glob.glob(os.path.join(args.input_dir, "*.mmcif"))
        )
        results = pipeline.process_batch(paths, args.output_dir, args.chain)
        ok = sum(1 for v in results.values() if v)
        print(f"processed {ok}/{len(results)} structures into {args.output_dir}")
    else:
        parser.error("provide --input or --input_dir")


if __name__ == "__main__":
    main()
