"""One-command released-weights conformance run against the BASELINE table.

For each requested variant, with the released HF weights mounted locally
(no weights ship in the CI environment — the HF hub repo is
``InstaDeepAI/protein-structure-tokenizer`` with subfolders ``4k_df_1`` etc.,
/root/reference/README.md:106-128):

    tokenize CASP14 -> decode tokens -> RMSD/TM vs the targets

and assert the mean backbone RMSD / TM-score against the reference's
published table (BASELINE.md, /root/reference/README.md:130-143) within
tolerance.  Exit code 0 = all requested variants conform.

Usage:
  python -m protein_structure_tokenizer_tpu.cli.conformance \\
      --weights_root /path/to/hf_download --workdir /tmp/conf \\
      [--variants 4096_1,64000_1] [--backend tpu] \\
      [--rmsd_tol 0.3] [--tm_tol 0.05] [--report conf.json]

``--weights_root`` must contain the HF subfolders (``4k_df_1``, ...); a
variant whose subfolder is missing is reported as SKIPPED (the command still
fails if *no* variant could run).
"""
import argparse
import json
import logging
import os
import shutil
import sys

from protein_structure_tokenizer_tpu.cli.common import force_backend, setup_logging

logger = logging.getLogger(__name__)

# (codebook_size, downsampling) -> (mean backbone RMSD A, mean TM-score)
# from /root/reference/README.md:130-143 ("obtained on CPU using the publicly
# released weights", CASP14).
BASELINE_TABLE = {
    (432, 1): (1.69, 0.89),
    (1728, 1): (1.54, 0.92),
    (4096, 1): (1.23, 0.94),
    (64000, 1): (0.97, 0.94),
    (4096, 2): (1.79, 0.72),
    (64000, 2): (1.70, 0.92),
    (4096, 4): (3.11, 0.72),
    (64000, 4): (2.70, 0.78),
}


def run_variant(codebook: int, df: int, weights_dir: str, pdb_dir: str,
                workdir: str, batch_size: int) -> dict:
    import numpy as np

    from protein_structure_tokenizer_tpu.eval.metrics import compare_structure_dirs
    from protein_structure_tokenizer_tpu.cli import decode_tokens, tokenize_pdb

    token_dir = os.path.join(workdir, "tokens")
    struct_dir = os.path.join(workdir, "structures")
    for d in (token_dir, struct_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)

    tokenize_pdb.main([
        "--pdb_dir", pdb_dir,
        "--token_save_path", token_dir,
        "--codebook_size", str(codebook),
        "--model_downsampling", str(df),
        "--weights", weights_dir,
        "--batch_size_per_device", str(batch_size),
    ])
    decode_tokens.main([
        "--tokens_dir", token_dir,
        "--structure_save_path", struct_dir,
        "--codebook_size", str(codebook),
        "--model_downsampling", str(df),
        "--weights", weights_dir,
        "--batch_size_per_device", str(batch_size),
    ])

    report = compare_structure_dirs(
        os.path.join(struct_dir, "structures"), pdb_dir, align=False
    )
    per_structure = {k: v for k, v in report.items() if not k.startswith("__")}
    if not per_structure:
        raise FileNotFoundError(
            f"no decoded/target pairs between {struct_dir} and {pdb_dir}"
        )
    rmsds = [m["rmsd"] for m in per_structure.values()]
    tms = [m["tm"] for m in per_structure.values()]
    return {
        "n_structures": len(per_structure),
        "mean_rmsd": float(np.mean(rmsds)),
        "mean_tm": float(np.mean(tms)),
    }


def main(argv=None) -> int:
    setup_logging()
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--weights_root", required=True,
                        help="directory with the HF subfolders (4k_df_1, ...)")
    parser.add_argument("--pdb_dir", default="/root/reference/casp14_pdbs")
    parser.add_argument("--workdir", default="/tmp/pst_conformance")
    parser.add_argument("--variants", default=None,
                        help="comma list of CODEBOOK_DF (e.g. 4096_1,64000_1); "
                        "default: every row of the BASELINE table")
    parser.add_argument("--backend", default=None, choices=["cpu", "gpu", "tpu"])
    parser.add_argument("--batch_size_per_device", type=int, default=16)
    parser.add_argument("--rmsd_tol", type=float, default=0.3,
                        help="allowed mean-RMSD excess over the table (A)")
    parser.add_argument("--tm_tol", type=float, default=0.05,
                        help="allowed mean-TM shortfall under the table")
    parser.add_argument("--report", default=None, help="write JSON report here")
    args = parser.parse_args(argv)
    if args.backend:
        force_backend(args.backend)

    from protein_structure_tokenizer_tpu.models.config import preset_name

    if args.variants:
        wanted = []
        for item in args.variants.split(","):
            cb, df = item.strip().split("_")
            wanted.append((int(cb), int(df)))
    else:
        wanted = sorted(BASELINE_TABLE)

    results, failures, ran = {}, [], 0
    for codebook, df in wanted:
        name = preset_name(codebook, df)
        weights_dir = os.path.join(args.weights_root, name)
        expected_rmsd, expected_tm = BASELINE_TABLE[(codebook, df)]
        if not os.path.isdir(weights_dir):
            logger.warning("SKIP %s: no weights at %s", name, weights_dir)
            results[name] = {"status": "skipped", "weights_dir": weights_dir}
            continue
        workdir = os.path.join(args.workdir, name)
        os.makedirs(workdir, exist_ok=True)
        got = run_variant(codebook, df, weights_dir, args.pdb_dir, workdir,
                          args.batch_size_per_device)
        ran += 1
        ok = (
            got["mean_rmsd"] <= expected_rmsd + args.rmsd_tol
            and got["mean_tm"] >= expected_tm - args.tm_tol
        )
        results[name] = {
            "status": "ok" if ok else "FAIL",
            **got,
            "expected_rmsd": expected_rmsd,
            "expected_tm": expected_tm,
        }
        logger.info(
            "%s: rmsd %.2f (table %.2f) tm %.3f (table %.2f) -> %s",
            name, got["mean_rmsd"], expected_rmsd, got["mean_tm"], expected_tm,
            results[name]["status"],
        )
        if not ok:
            failures.append(name)

    if args.report:
        with open(args.report, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    if ran == 0:
        logger.error("no variant had weights under %s", args.weights_root)
        return 2
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
