"""Evaluate reconstructed structures against their targets.

Counterpart of the reference's TMalign batch comparison
(/root/reference/structure_tokenizer/utils/utils.py:71-156, which
regex-parses an external binary's stdout) and its ``metrics.pkl`` persistence
(protein.py:429-489) — here the TM-score/RMSD/GDT metrics are computed
natively (eval/metrics.py, optionally the C++ module).

Usage:
  python -m protein_structure_tokenizer_tpu.cli.evaluate \
      --predicted_dir out/structures --target_dir casp14_pdbs \
      --report out/metrics.json
"""
import argparse
import json
import logging
import pickle

from protein_structure_tokenizer_tpu.cli.common import setup_logging
from protein_structure_tokenizer_tpu.eval.metrics import compare_structure_dirs

logger = logging.getLogger(__name__)


def main(argv=None) -> None:
    setup_logging()
    parser = argparse.ArgumentParser(description="Compare predicted vs target PDBs")
    parser.add_argument("--predicted_dir", type=str, required=True)
    parser.add_argument("--target_dir", type=str, required=True)
    parser.add_argument("--report", type=str, default=None,
                        help=".json or .pkl output path (default: stdout only)")
    parser.add_argument("--align", action="store_true",
                        help="Sequence-independent TM-align search (chains may "
                        "differ in length) instead of 1:1 TM-score")
    parser.add_argument("--lddt", action="store_true",
                        help="Also report superposition-free global lDDT "
                        "(1:1 mode only)")
    args = parser.parse_args(argv)
    if args.lddt and args.align:
        parser.error("--lddt requires 1:1 correspondence; drop --align")

    report = compare_structure_dirs(
        args.predicted_dir, args.target_dir, align=args.align, with_lddt=args.lddt
    )
    if not report:
        raise FileNotFoundError(
            f"no basename-matched .pdb pairs between {args.predicted_dir} "
            f"and {args.target_dir}"
        )

    agg = report.get("__aggregate__", {})
    n = len(report) - ("__aggregate__" in report)
    logger.info("compared %d structure pairs", n)
    for key in ("tm_mean", "tm_std", "rmsd_mean", "rmsd_std", "lddt_mean",
                "gdt_ts_mean", "gdt_ha_mean", "maxsub_mean",
                "tm_norm_a_mean", "tm_norm_b_mean", "rmsd_aligned_mean",
                "n_aligned_mean"):
        if key in agg:
            logger.info("%s: %.4f", key, agg[key])

    if args.report:
        if args.report.endswith(".pkl"):
            with open(args.report, "wb") as f:
                pickle.dump(report, f)
        else:
            with open(args.report, "w") as f:
                json.dump(report, f, indent=2, sort_keys=True)
        logger.info("wrote %s", args.report)
    else:
        print(json.dumps(agg or report, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
