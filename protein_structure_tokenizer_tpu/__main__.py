"""Unified CLI dispatcher: ``python -m protein_structure_tokenizer_tpu <cmd>``.

The reference exposes each entry point as a separate script under
``/root/reference/scripts/`` (tokenize_pdb.py, decode_tokens.py,
gpt_generation.py) plus a standalone ``data_pipeline.py``.  This framework
keeps the per-command modules under ``cli/`` (same flags) and adds one
umbrella command so an installed package exposes the whole surface:

    pst tokenize  --pdb_dir ... --token_save_path ...
    pst decode    --tokens_dir ... --structure_save_path ...
    pst generate  --save_dir ...
    pst score     --tokens_dir ...
    pst data-pipeline --input ...
    pst evaluate  --predicted_dir ... --target_dir ...
    pst train / pst train-lm / pst serve
"""
import sys

# command name -> (module under .cli, summary line for --help)
COMMANDS = {
    "tokenize": ("tokenize_pdb", "PDB directory -> token .npy files"),
    "decode": ("decode_tokens", "token .npy files -> PDB structures"),
    "generate": ("gpt_generation", "sample novel token sequences from the GPT"),
    "score": ("score_tokens", "LM log-likelihood / perplexity of token files"),
    "data-pipeline": ("data_pipeline", "standalone parse/validate/featurize pipeline"),
    "evaluate": ("evaluate", "structural metrics between PDB directories"),
    "train": ("train", "train the structure tokenizer (FAPE)"),
    "train-lm": ("train_lm", "train the GPT LM on token files"),
    "serve": ("serve", "HTTP inference server with continuous batching"),
}


def _usage() -> str:
    lines = ["usage: pst <command> [args...]", "", "commands:"]
    for name, (_, summary) in COMMANDS.items():
        lines.append(f"  {name:<14} {summary}")
    lines.append("")
    lines.append("Run 'pst <command> --help' for command-specific flags.")
    return "\n".join(lines)


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(_usage())
        raise SystemExit(0 if argv else 2)
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd!r}\n\n{_usage()}", file=sys.stderr)
        raise SystemExit(2)
    module_name, _ = COMMANDS[cmd]
    import importlib

    module = importlib.import_module(f"protein_structure_tokenizer_tpu.cli.{module_name}")
    module.main(argv[1:])


if __name__ == "__main__":
    main()
