"""CLI surface smoke tests: every entry point parses --help and validates args.

These catch import rot and argument-wiring regressions cheaply (the heavy
end-to-end paths are covered by tests/test_runner.py and the verify recipe).
"""
import subprocess
import sys

import pytest

CLIS = [
    "tokenize_pdb",
    "decode_tokens",
    "gpt_generation",
    "data_pipeline",
    "evaluate",
    "train",
    "train_lm",
]


@pytest.mark.parametrize("name", CLIS)
def test_cli_help(name):
    result = subprocess.run(
        [sys.executable, "-m", f"protein_structure_tokenizer_tpu.cli.{name}", "--help"],
        capture_output=True,
        text=True,
        timeout=120,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo"},
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "usage:" in result.stdout


def test_train_parse_args():
    from protein_structure_tokenizer_tpu.cli.train import parse_args

    args = parse_args(["--data_dir", "d", "--checkpoint_dir", "c", "--num_steps", "5"])
    assert args.num_steps == 5 and args.codebook_size == 4096


def test_train_lm_parse_args():
    from protein_structure_tokenizer_tpu.cli.train_lm import parse_args

    args = parse_args(["--tokens_dir", "t", "--checkpoint_dir", "c",
                       "--embed_dim", "64", "--block_size", "32"])
    assert args.embed_dim == 64 and args.block_size == 32


def test_gpt_config_validation():
    import pytest as _pytest

    from protein_structure_tokenizer_tpu.lm import gpt

    with _pytest.raises(ValueError):
        gpt.GptConfig(vocab_size=10, embed_dim=64, num_heads=16, rope_dimensions=8)
    with _pytest.raises(ValueError):
        gpt.GptConfig(vocab_size=10, embed_dim=65, num_heads=16)
    cfg = gpt.GptConfig(vocab_size=10, embed_dim=64, num_heads=4, rope_dimensions=8)
    assert cfg.key_size == 16
